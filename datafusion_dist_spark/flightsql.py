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
