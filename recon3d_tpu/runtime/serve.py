"""Persistent reconstruction service: warm jit caches across requests.

A fresh CLI process pays per-process tolls that dominate its wall-clock on
tunneled TPU hosts: the first device->host fetch stall (0-300+ s), the
per-program persistent-cache deserialization, and relay re-establishment
(BASELINE.md). The pipeline itself is 5-10x faster than a fresh process
shows — `northstar_run.py --in-process` measures 18-22 s for the full
50-view --mvs job vs 112-148 s per fresh process. This module makes that
steady state a product surface instead of a benchmark artifact: a daemon
that initializes the device once, keeps every jitted program live, and
runs CLI requests in-process, streaming their stdout to the client.

Protocol (newline-delimited JSON over a Unix domain socket):

  client -> server   {"argv": ["<dataset>", "--mvs", ...]}
                     {"ping": true}
                     {"shutdown": true}
  server -> client   {"log": "<one stdout line>"}      (zero or more)
                     {"done": true, "exit_code": 0}    (terminal)
                     {"pong": true}                    (ping reply)

Requests are handled one at a time (one TPU, one compile cache); queued
connections wait in the listen backlog. The client (`request`) never
imports JAX, so submitting costs a bare Python interpreter start.

The GUI worker routes through a running service when its options carry
`serve_socket` (runtime/worker.py), mirroring the reference's
CLI/worker contract (src/gui/worker.py:55-97) with the subprocess
replaced by a live daemon.

Run the daemon:   python -m recon3d_tpu.runtime.serve --socket /tmp/r3d.sock
Submit a job:     python -m recon3d_tpu.runtime.serve --socket /tmp/r3d.sock \
                      --submit <dataset> --mvs --output out/
Stop it:          python -m recon3d_tpu.runtime.serve --socket /tmp/r3d.sock \
                      --shutdown
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path
from typing import Callable, List, Optional

DEFAULT_SOCKET = "/tmp/recon3d_tpu.sock"


class _LineForwarder(io.TextIOBase):
    """File-like stdout replacement that forwards complete lines."""

    def __init__(self, emit: Callable[[str], None]):
        self._emit = emit
        self._buf = ""

    def write(self, s: str) -> int:
        self._buf += s
        while "\n" in self._buf:
            line, self._buf = self._buf.split("\n", 1)
            self._emit(line)
        return len(s)

    def flush(self) -> None:
        if self._buf:
            self._emit(self._buf)
            self._buf = ""


def _send(conn: socket.socket, obj: dict) -> None:
    conn.sendall((json.dumps(obj) + "\n").encode())


class ReconstructionServer:
    """Single-worker reconstruction daemon over a Unix domain socket."""

    def __init__(self, socket_path: str = DEFAULT_SOCKET, quiet: bool = False):
        self.socket_path = socket_path
        self.quiet = quiet
        self._sock: Optional[socket.socket] = None
        self.requests_served = 0

    # -- lifecycle ----------------------------------------------------------

    def bind(self) -> None:
        path = Path(self.socket_path)
        if path.exists():
            # A previous daemon may have died without unlinking; only steal
            # the path if nothing answers a ping on it.
            if ping(self.socket_path, timeout=2.0):
                raise RuntimeError(
                    f"another server is live on {self.socket_path}"
                )
            path.unlink()
        path.parent.mkdir(parents=True, exist_ok=True)
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.bind(self.socket_path)
        self._sock.listen(16)

    def warm(self) -> None:
        """Establish the device link + import the heavy modules now, so the
        first request doesn't pay for them."""
        from recon3d_tpu.runtime.warmup import warm_device_async

        warm_device_async()
        # Import (not run) the pipeline stack: module import + conftest-free
        # jax tracing setup is a measurable part of a cold first request.
        import recon3d_tpu.cli  # noqa: F401
        import recon3d_tpu.sfm.pipeline  # noqa: F401

    def serve_forever(self) -> None:
        if self._sock is None:
            self.bind()
        self.warm()
        if not self.quiet:
            print(f"[serve] listening on {self.socket_path}", flush=True)
        try:
            while True:
                conn, _ = self._sock.accept()
                try:
                    if not self._handle(conn):
                        break
                finally:
                    conn.close()
        finally:
            self.close()

    def close(self) -> None:
        if self._sock is not None:
            self._sock.close()
            self._sock = None
        with contextlib.suppress(OSError):
            os.unlink(self.socket_path)

    # -- request handling ---------------------------------------------------

    def _handle(self, conn: socket.socket) -> bool:
        """Serve one connection. Returns False when asked to shut down."""
        f = conn.makefile("r")
        line = f.readline()
        if not line.strip():
            return True
        try:
            req = json.loads(line)
        except json.JSONDecodeError:
            _send(conn, {"done": True, "exit_code": 2,
                         "error": "bad request JSON"})
            return True
        if req.get("ping"):
            _send(conn, {"pong": True,
                         "requests_served": self.requests_served})
            return True
        if req.get("shutdown"):
            _send(conn, {"done": True, "exit_code": 0})
            if not self.quiet:
                print("[serve] shutdown requested", flush=True)
            return False
        argv = req.get("argv")
        if not isinstance(argv, list):
            _send(conn, {"done": True, "exit_code": 2,
                         "error": "request needs 'argv' (list of CLI args)"})
            return True
        rc = self._run(conn, [str(a) for a in argv])
        self.requests_served += 1
        _send(conn, {"done": True, "exit_code": rc})
        return True

    def _run(self, conn: socket.socket, argv: List[str]) -> int:
        from recon3d_tpu import cli

        real_stdout = sys.stdout

        def emit(line: str) -> None:
            if not self.quiet:
                print(line, file=real_stdout, flush=True)
            try:
                _send(conn, {"log": line})
            except OSError:
                pass  # client went away; finish the job regardless

        fwd = _LineForwarder(emit)
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(fwd):
                rc = cli.main(argv)
        except SystemExit as e:  # resolve_dataset errors etc.
            emit(str(e))
            rc = e.code if isinstance(e.code, int) else 1
        except Exception as e:  # noqa: BLE001 — daemon must survive requests
            import traceback

            emit(f"ERROR: {type(e).__name__}: {e}")
            for tb_line in traceback.format_exc().splitlines():
                emit(tb_line)
            rc = 1
        fwd.flush()
        emit(f"[serve] request finished in {time.time() - t0:.1f}s "
             f"(exit {rc})")
        return rc if isinstance(rc, int) else 0


# -- client (no JAX import) -------------------------------------------------


def ping(socket_path: str = DEFAULT_SOCKET, timeout: float = 5.0) -> bool:
    """True if a live server answers on socket_path."""
    try:
        with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
            s.settimeout(timeout)
            s.connect(socket_path)
            _send(s, {"ping": True})
            reply = s.makefile("r").readline()
        return bool(json.loads(reply).get("pong"))
    except (OSError, json.JSONDecodeError, ValueError):
        return False


def request(
    argv: List[str],
    socket_path: str = DEFAULT_SOCKET,
    on_log: Optional[Callable[[str], None]] = None,
) -> int:
    """Submit one CLI job to a running server; stream its stdout lines to
    on_log. Returns the job's exit code. Raises ConnectionError if no
    server is listening."""
    try:
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.connect(socket_path)
    except OSError as e:
        raise ConnectionError(
            f"no reconstruction server on {socket_path}: {e}"
        ) from e
    with s:
        _send(s, {"argv": argv})
        for line in s.makefile("r"):
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "log" in msg and on_log is not None:
                on_log(msg["log"])
            if msg.get("done"):
                return int(msg.get("exit_code", 1))
    return 1  # connection closed without a terminal message


def shutdown(socket_path: str = DEFAULT_SOCKET) -> bool:
    """Ask a running server to exit. True if it acknowledged."""
    try:
        with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
            s.connect(socket_path)
            _send(s, {"shutdown": True})
            reply = s.makefile("r").readline()
        return bool(json.loads(reply).get("done"))
    except (OSError, json.JSONDecodeError, ValueError):
        return False


def ensure_server(
    socket_path: str = DEFAULT_SOCKET,
    spawn_timeout: float = 120.0,
) -> bool:
    """Make sure a server is live on socket_path, spawning a detached
    daemon process if needed. Returns True once it answers a ping."""
    if ping(socket_path, timeout=2.0):
        return True
    subprocess.Popen(
        [sys.executable, "-m", "recon3d_tpu.runtime.serve",
         "--socket", socket_path, "--quiet"],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    deadline = time.time() + spawn_timeout
    while time.time() < deadline:
        if ping(socket_path, timeout=2.0):
            return True
        time.sleep(0.25)
    return False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="recon3d_tpu.serve",
        description="Persistent reconstruction service (warm TPU caches "
                    "across requests)",
    )
    p.add_argument("--socket", default=DEFAULT_SOCKET,
                   help=f"Unix socket path (default {DEFAULT_SOCKET})")
    p.add_argument("--submit", nargs=argparse.REMAINDER, default=None,
                   metavar="CLI_ARGS",
                   help="Submit a CLI job to a running server instead of "
                        "starting one; everything after --submit is the "
                        "recon3d_tpu.cli argv")
    p.add_argument("--shutdown", action="store_true",
                   help="Stop a running server")
    p.add_argument("--ensure", action="store_true",
                   help="With --submit: auto-start the server if none is "
                        "running")
    p.add_argument("--quiet", action="store_true",
                   help="Server: don't mirror request logs to stdout")
    args = p.parse_args(argv)

    if args.shutdown:
        ok = shutdown(args.socket)
        print("server stopped" if ok else "no server running")
        return 0 if ok else 1
    if args.submit is not None:
        if not args.submit:
            p.error("--submit needs CLI arguments")
        if args.ensure and not ensure_server(args.socket):
            print("ERROR: could not start server", file=sys.stderr)
            return 1
        try:
            return request(args.submit, args.socket, on_log=print)
        except ConnectionError as e:
            print(f"ERROR: {e}", file=sys.stderr)
            return 1
    ReconstructionServer(args.socket, quiet=args.quiet).serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
