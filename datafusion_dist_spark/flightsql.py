"""Minimal Arrow FlightSQL protobuf envelope codec.

The reference app speaks Arrow **FlightSQL**: clients send a
``CommandStatementQuery`` protobuf packed in a ``google.protobuf.Any``
as the flight-descriptor command, and receive tickets wrapping a
``TicketStatementQuery`` (``integration-tests/app/src/main.rs:267-308``
— ``get_flight_info_statement``/``do_get_statement``). Stock FlightSQL
clients (ADBC, the JDBC/ODBC FlightSQL drivers) therefore connect to it
unmodified. This module lets the Spark server accept and mint the same
envelopes WITHOUT a protobuf dependency: the two messages involved are
tiny, so their wire format is hand-coded here from the public protobuf
wire spec and the public ``FlightSql.proto`` schema:

- ``google.protobuf.Any``       = {1: type_url (string), 2: value (bytes)}
- ``CommandStatementQuery``     = {1: query (string), 2: transaction_id (bytes)}
- ``TicketStatementQuery``      = {1: statement_handle (bytes)}

All three use only length-delimited fields (wire type 2).
"""

from __future__ import annotations

_TYPE_PREFIX = "type.googleapis.com/arrow.flight.protocol.sql."
CMD_STATEMENT_QUERY = _TYPE_PREFIX + "CommandStatementQuery"
TICKET_STATEMENT_QUERY = _TYPE_PREFIX + "TicketStatementQuery"


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf) or shift > 63:
            raise ValueError("truncated or oversized varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _ld_field(field_no: int, payload: bytes) -> bytes:
    """Encode one length-delimited field (wire type 2)."""
    return _varint(field_no << 3 | 2) + _varint(len(payload)) + payload


def _parse_fields(buf: bytes) -> dict[int, list[bytes]]:
    """Parse a message of only length-delimited fields; raises
    ``ValueError`` on any other wire type or malformed input — which is
    how plain-SQL text commands are rejected cleanly."""
    fields: dict[int, list[bytes]] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field_no, wire_type = tag >> 3, tag & 7
        if wire_type != 2 or field_no == 0:
            raise ValueError(f"unsupported wire type {wire_type}")
        length, pos = _read_varint(buf, pos)
        if pos + length > len(buf):
            raise ValueError("truncated length-delimited field")
        fields.setdefault(field_no, []).append(buf[pos : pos + length])
        pos += length
    return fields


def encode_any(type_url: str, value: bytes) -> bytes:
    return _ld_field(1, type_url.encode("utf-8")) + _ld_field(2, value)


def decode_any(buf: bytes) -> tuple[str, bytes]:
    fields = _parse_fields(buf)
    if 1 not in fields:
        raise ValueError("Any without type_url")
    return fields[1][-1].decode("utf-8"), fields[2][-1] if 2 in fields else b""


def encode_statement_query(sql: str) -> bytes:
    """Any<CommandStatementQuery> — what a stock FlightSQL client sends
    as the flight-descriptor command for ad-hoc SQL."""
    return encode_any(CMD_STATEMENT_QUERY, _ld_field(1, sql.encode("utf-8")))


def parse_statement_query(command: bytes) -> str | None:
    """Return the SQL if ``command`` is an Any<CommandStatementQuery>,
    else None (callers fall back to the plain-SQL descriptor)."""
    try:
        type_url, value = decode_any(command)
        if type_url != CMD_STATEMENT_QUERY:
            return None
        fields = _parse_fields(value)
        return fields[1][-1].decode("utf-8") if 1 in fields else None
    except (ValueError, UnicodeDecodeError, IndexError):
        return None


def encode_ticket(statement_handle: bytes) -> bytes:
    """Any<TicketStatementQuery> — the opaque ticket a FlightSQL client
    hands back verbatim at do_get."""
    return encode_any(TICKET_STATEMENT_QUERY, _ld_field(1, statement_handle))


def parse_ticket(ticket: bytes) -> bytes | None:
    """Return the statement_handle if ``ticket`` is an
    Any<TicketStatementQuery>, else None."""
    try:
        type_url, value = decode_any(ticket)
        if type_url != TICKET_STATEMENT_QUERY:
            return None
        fields = _parse_fields(value)
        return fields[1][-1] if 1 in fields else None
    except (ValueError, UnicodeDecodeError, IndexError):
        return None


# -- prepared statements ---------------------------------------------------
# Beyond the reference's surface (its app implements only ad-hoc
# statements): the FlightSQL prepared-statement handshake, from the
# public FlightSql.proto —
#   ActionCreatePreparedStatementRequest = {1: query, 2: transaction_id}
#   ActionCreatePreparedStatementResult  = {1: prepared_statement_handle,
#                                           2: dataset_schema,
#                                           3: parameter_schema}
#   ActionClosePreparedStatementRequest  = {1: prepared_statement_handle}
#   CommandPreparedStatementQuery        = {1: prepared_statement_handle}
# Again only length-delimited fields, so the same codec carries them.

ACTION_CREATE_PREPARED_REQUEST = (
    _TYPE_PREFIX + "ActionCreatePreparedStatementRequest"
)
ACTION_CREATE_PREPARED_RESULT = (
    _TYPE_PREFIX + "ActionCreatePreparedStatementResult"
)
ACTION_CLOSE_PREPARED_REQUEST = (
    _TYPE_PREFIX + "ActionClosePreparedStatementRequest"
)
CMD_PREPARED_STATEMENT_QUERY = _TYPE_PREFIX + "CommandPreparedStatementQuery"


def encode_create_prepared_request(sql: str) -> bytes:
    return encode_any(
        ACTION_CREATE_PREPARED_REQUEST, _ld_field(1, sql.encode("utf-8"))
    )


def parse_create_prepared_request(body: bytes) -> str | None:
    try:
        type_url, value = decode_any(body)
        if type_url != ACTION_CREATE_PREPARED_REQUEST:
            return None
        fields = _parse_fields(value)
        return fields[1][-1].decode("utf-8") if 1 in fields else None
    except (ValueError, UnicodeDecodeError, IndexError):
        return None


def encode_create_prepared_result(
    handle: bytes, dataset_schema: bytes = b""
) -> bytes:
    msg = _ld_field(1, handle)
    if dataset_schema:
        msg += _ld_field(2, dataset_schema)
    return encode_any(ACTION_CREATE_PREPARED_RESULT, msg)


def parse_create_prepared_result(body: bytes) -> tuple[bytes, bytes] | None:
    """(handle, dataset_schema) from an
    Any<ActionCreatePreparedStatementResult>, else None."""
    try:
        type_url, value = decode_any(body)
        if type_url != ACTION_CREATE_PREPARED_RESULT:
            return None
        fields = _parse_fields(value)
        handle = fields[1][-1] if 1 in fields else b""
        schema = fields[2][-1] if 2 in fields else b""
        return handle, schema
    except (ValueError, UnicodeDecodeError, IndexError):
        return None


def encode_close_prepared_request(handle: bytes) -> bytes:
    return encode_any(ACTION_CLOSE_PREPARED_REQUEST, _ld_field(1, handle))


def parse_close_prepared_request(body: bytes) -> bytes | None:
    try:
        type_url, value = decode_any(body)
        if type_url != ACTION_CLOSE_PREPARED_REQUEST:
            return None
        fields = _parse_fields(value)
        return fields[1][-1] if 1 in fields else None
    except (ValueError, UnicodeDecodeError, IndexError):
        return None


def encode_prepared_query(handle: bytes) -> bytes:
    return encode_any(CMD_PREPARED_STATEMENT_QUERY, _ld_field(1, handle))


def parse_prepared_query(command: bytes) -> bytes | None:
    try:
        type_url, value = decode_any(command)
        if type_url != CMD_PREPARED_STATEMENT_QUERY:
            return None
        fields = _parse_fields(value)
        return fields[1][-1] if 1 in fields else None
    except (ValueError, UnicodeDecodeError, IndexError):
        return None


# -- catalog metadata discovery --------------------------------------------
# Also beyond the reference's surface: the FlightSQL metadata commands a
# stock ADBC/JDBC client issues on connect to browse the catalog, from
# the public FlightSql.proto —
#   CommandGetCatalogs   = {}
#   CommandGetDbSchemas  = {1: catalog, 2: db_schema_filter_pattern}
#   CommandGetTables     = {1: catalog, 2: db_schema_filter_pattern,
#                           3: table_name_filter_pattern,
#                           4: repeated table_types,
#                           5: include_schema (bool, wire type 0)}
#   CommandGetTableTypes = {}
# include_schema is the one varint field in the whole surface, so these
# commands get a mixed-wire-type parser.

CMD_GET_CATALOGS = _TYPE_PREFIX + "CommandGetCatalogs"
CMD_GET_DB_SCHEMAS = _TYPE_PREFIX + "CommandGetDbSchemas"
CMD_GET_TABLES = _TYPE_PREFIX + "CommandGetTables"
CMD_GET_TABLE_TYPES = _TYPE_PREFIX + "CommandGetTableTypes"
CMD_GET_SQL_INFO = _TYPE_PREFIX + "CommandGetSqlInfo"

# The FlightSQL SqlInfo ids this server knows how to answer (public
# FlightSql.proto enum SqlInfo). A stock ADBC/JDBC client probes
# GetSqlInfo at connect time BEFORE GetTables; the reference app
# inherits FlightSqlService's default and no-ops registration
# (integration-tests/app/src/main.rs:310), so a valid — even empty —
# response is the parity bar. We answer the basic server-identity ids.
SQL_INFO_FLIGHT_SQL_SERVER_NAME = 0
SQL_INFO_FLIGHT_SQL_SERVER_VERSION = 1
SQL_INFO_FLIGHT_SQL_SERVER_ARROW_VERSION = 2
SQL_INFO_FLIGHT_SQL_SERVER_READ_ONLY = 3
SQL_INFO_FLIGHT_SQL_SERVER_SQL = 4


def _varint_field(field_no: int, value: int) -> bytes:
    return _varint(field_no << 3 | 0) + _varint(value)


def _parse_fields_mixed(buf: bytes) -> dict[int, list]:
    """Parse length-delimited (-> bytes) and varint (-> int) fields."""
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field_no, wire_type = tag >> 3, tag & 7
        if field_no == 0:
            raise ValueError("field number 0")
        if wire_type == 2:
            length, pos = _read_varint(buf, pos)
            if pos + length > len(buf):
                raise ValueError("truncated length-delimited field")
            fields.setdefault(field_no, []).append(buf[pos : pos + length])
            pos += length
        elif wire_type == 0:
            value, pos = _read_varint(buf, pos)
            fields.setdefault(field_no, []).append(value)
        else:
            raise ValueError(f"unsupported wire type {wire_type}")
    return fields


def encode_get_catalogs() -> bytes:
    return encode_any(CMD_GET_CATALOGS, b"")


def encode_get_db_schemas(
    catalog: str | None = None, db_schema_filter_pattern: str | None = None
) -> bytes:
    body = b""
    if catalog is not None:
        body += _ld_field(1, catalog.encode("utf-8"))
    if db_schema_filter_pattern is not None:
        body += _ld_field(2, db_schema_filter_pattern.encode("utf-8"))
    return encode_any(CMD_GET_DB_SCHEMAS, body)


def encode_get_tables(
    catalog: str | None = None,
    db_schema_filter_pattern: str | None = None,
    table_name_filter_pattern: str | None = None,
    table_types: tuple[str, ...] = (),
    include_schema: bool = False,
) -> bytes:
    body = b""
    if catalog is not None:
        body += _ld_field(1, catalog.encode("utf-8"))
    if db_schema_filter_pattern is not None:
        body += _ld_field(2, db_schema_filter_pattern.encode("utf-8"))
    if table_name_filter_pattern is not None:
        body += _ld_field(3, table_name_filter_pattern.encode("utf-8"))
    for t in table_types:
        body += _ld_field(4, t.encode("utf-8"))
    if include_schema:
        body += _varint_field(5, 1)
    return encode_any(CMD_GET_TABLES, body)


def encode_get_table_types() -> bytes:
    return encode_any(CMD_GET_TABLE_TYPES, b"")


def encode_get_sql_info(*infos: int) -> bytes:
    """Any<CommandGetSqlInfo> = {1: repeated uint32 info}. proto3
    packs repeated scalars by default (one length-delimited field of
    concatenated varints), which is what stock clients emit."""
    if not infos:
        return encode_any(CMD_GET_SQL_INFO, b"")
    packed = b"".join(_varint(i) for i in infos)
    return encode_any(CMD_GET_SQL_INFO, _ld_field(1, packed))


def _decode_packed_varints(buf: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return out


def parse_metadata_command(command: bytes) -> tuple[str, dict] | None:
    """(kind, params) when ``command`` is a FlightSQL catalog-metadata
    Any; None otherwise. kind ∈ {catalogs, db_schemas, tables,
    table_types, sql_info}; params carry the decoded filters."""
    try:
        type_url, value = decode_any(command)
    except (ValueError, UnicodeDecodeError, IndexError):
        return None
    if type_url == CMD_GET_CATALOGS:
        return "catalogs", {}
    if type_url == CMD_GET_TABLE_TYPES:
        return "table_types", {}
    if type_url == CMD_GET_SQL_INFO:
        # Accept both encodings of `repeated uint32 info`: proto3
        # packed (one bytes field of concatenated varints) and the
        # unpacked form (repeated varint fields) older encoders emit.
        try:
            fields = _parse_fields_mixed(value)
            infos: list[int] = []
            for item in fields.get(1, []):
                if isinstance(item, bytes):
                    infos.extend(_decode_packed_varints(item))
                else:
                    infos.append(item)
        except ValueError:
            return None
        return "sql_info", {"info": infos}
    try:
        fields = _parse_fields_mixed(value)

        def s(no: int) -> str | None:
            # A malformed client may send a string field varint-encoded;
            # treat any non-bytes value as a malformed command (→ None
            # via the enclosing except), never an AttributeError
            # escaping as an opaque gRPC internal error.
            if no not in fields:
                return None
            v = fields[no][-1]
            if not isinstance(v, bytes):
                raise ValueError(f"field {no}: expected bytes")
            return v.decode("utf-8")

        if type_url == CMD_GET_DB_SCHEMAS:
            return "db_schemas", {
                "catalog": s(1),
                "db_schema_filter_pattern": s(2),
            }
        if type_url == CMD_GET_TABLES:
            types = []
            for b in fields.get(4, []):
                if not isinstance(b, bytes):
                    raise ValueError("field 4: expected bytes")
                types.append(b.decode("utf-8"))
            return "tables", {
                "catalog": s(1),
                "db_schema_filter_pattern": s(2),
                "table_name_filter_pattern": s(3),
                "table_types": types,
                "include_schema": bool(fields[5][-1]) if 5 in fields else False,
            }
    except (ValueError, UnicodeDecodeError):
        return None
    return None


def sql_like_match(pattern: str | None, value: str) -> bool:
    """FlightSQL filter patterns are SQL LIKE: ``%`` any run, ``_`` one
    char; None/empty matches everything."""
    if not pattern:
        return True
    import re

    rx = "".join(
        ".*" if ch == "%" else "." if ch == "_" else re.escape(ch)
        for ch in pattern
    )
    return re.fullmatch(rx, value) is not None
