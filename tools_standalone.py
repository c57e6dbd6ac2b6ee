"""Real Spark STANDALONE cluster on one host: master + worker daemons
as separate OS processes, connected over ``spark://``.

The reference's whole integration harness runs on a real multi-node
docker cluster — separate processes with a network between them
(``integration-tests/docker-compose.yaml:4-53``: 3 app nodes +
Postgres). ``local-cluster[2,4,4096]`` gets separate EXECUTOR JVMs but
hides the deployment layer: master and workers live inside the driver
JVM, so daemon scheduling, worker-side executor launch, and
worker-relaunch-after-executor-death are never exercised as real
processes. This module closes that last shape gap the sandbox allows:

- ``start_master`` / ``start_worker`` spawn the actual
  ``org.apache.spark.deploy.master.Master`` / ``worker.Worker`` via
  pyspark's bundled ``spark-class`` — the same daemons
  ``sbin/start-master.sh`` runs on a production standalone cluster.
- Sessions connect with ``SPARK_GRAFT_MASTER=spark://host:port``
  through the engine's ordinary ``build_session`` (which propagates
  PYTHONPATH to executor Python workers for non-local masters).

Used by ``tests/test_standalone.py`` (correctness + executor-kill on
the standalone shape) and ``bench_standalone.py`` (walls vs
local-cluster). Daemons bind real TCP ports; callers must tolerate a
sandbox that forbids binding by skipping (the test does).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time

SPARK_BIN = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__)), "bin"
)


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(args: list[str], log_path: str, env_extra: dict | None = None):
    env = dict(os.environ)
    # The REST submission server binds a FIXED port (6066) regardless
    # of the master port — two test runs (or a co-tenant) would
    # collide; the daemons don't need it.
    env["SPARK_MASTER_OPTS"] = "-Dspark.master.rest.enabled=false"
    env.update(env_extra or {})
    log = open(log_path, "w")
    return subprocess.Popen(
        [os.path.join(SPARK_BIN, "spark-class"), *args],
        stdout=log,
        stderr=subprocess.STDOUT,
        env=env,
    )


def start_master(port: int, log_dir: str) -> subprocess.Popen:
    return _spawn(
        [
            "org.apache.spark.deploy.master.Master",
            "--host",
            "127.0.0.1",
            "--port",
            str(port),
            "--webui-port",
            "0",
        ],
        os.path.join(log_dir, "master.log"),
    )


def start_worker(
    master_url: str, idx: int, log_dir: str, cores: int = 4, mem: str = "4g"
) -> subprocess.Popen:
    work_dir = os.path.join(log_dir, f"worker{idx}")
    os.makedirs(work_dir, exist_ok=True)
    return _spawn(
        [
            "org.apache.spark.deploy.worker.Worker",
            master_url,
            "--host",
            "127.0.0.1",
            "--cores",
            str(cores),
            "--memory",
            mem,
            "--webui-port",
            "0",
            "--work-dir",
            work_dir,
        ],
        os.path.join(log_dir, f"worker{idx}.log"),
    )


def wait_for_line(log_path: str, needle: str, timeout: float, proc=None) -> bool:
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc is not None and proc.poll() is not None:
            return False
        try:
            with open(log_path) as fh:
                if needle in fh.read():
                    return True
        except OSError:
            pass
        time.sleep(0.5)
    return False


class StandaloneCluster:
    """Context manager: one master + N worker daemons, all separate
    processes, torn down (SIGKILL, daemons hold no state worth a
    graceful stop) on exit. ``master_url`` is the ``spark://`` address
    sessions connect to."""

    def __init__(self, log_dir: str, workers: int = 2, cores: int = 4,
                 mem: str = "4g"):
        self.log_dir = log_dir
        self.n_workers = workers
        self.cores = cores
        self.mem = mem
        self.procs: list[subprocess.Popen] = []
        self.master_url = ""

    def __enter__(self) -> "StandaloneCluster":
        os.makedirs(self.log_dir, exist_ok=True)
        port = free_port()
        self.master_url = f"spark://127.0.0.1:{port}"
        master = start_master(port, self.log_dir)
        self.procs.append(master)
        if not wait_for_line(
            os.path.join(self.log_dir, "master.log"),
            "I have been elected leader",
            90,
            master,
        ):
            self.__exit__(None, None, None)
            raise RuntimeError(
                "standalone master never came up (port bind forbidden?)"
            )
        for i in range(self.n_workers):
            w = start_worker(
                self.master_url, i, self.log_dir, self.cores, self.mem
            )
            self.procs.append(w)
        for i in range(self.n_workers):
            if not wait_for_line(
                os.path.join(self.log_dir, f"worker{i}.log"),
                "Successfully registered with master",
                90,
                self.procs[i + 1],
            ):
                self.__exit__(None, None, None)
                raise RuntimeError(f"worker {i} never registered")
        return self

    def __exit__(self, *exc) -> None:
        for p in reversed(self.procs):
            try:
                p.kill()
            except OSError:
                pass
        for p in self.procs:
            try:
                p.wait(timeout=30)
            except Exception:
                pass
        self.procs.clear()


def session_env(repo: str, master_url: str, **extra: str) -> dict:
    """Environment for a subprocess that builds an engine session
    against the standalone master (sessions must run in their own
    process: the pytest process already owns a local[*] context)."""
    env = dict(
        os.environ,
        PYTHONPATH=repo,
        SPARK_GRAFT_MASTER=master_url,
        SPARK_GRAFT_DRIVER_MEM="4g",
    )
    env.update(extra)
    return env


if __name__ == "__main__":
    # Smoke: bring the cluster up, run one aggregate, tear down.
    repo = os.path.dirname(os.path.abspath(__file__))
    with StandaloneCluster("/tmp/ddspark-standalone-smoke") as c:
        print(f"cluster up at {c.master_url}")
        code = subprocess.run(
            [
                sys.executable,
                "-c",
                "import sys, os; sys.path.insert(0, os.environ['PYTHONPATH'])\n"
                "from datafusion_dist_spark.session import build_session\n"
                "s = build_session('sa-smoke', shuffle_partitions=8,\n"
                "    extra_conf={'spark.executor.memory': '2g'})\n"
                "print('count:', s.range(1000).count()); s.stop()",
            ],
            env=session_env(repo, c.master_url),
        ).returncode
        print("smoke exit", code)
