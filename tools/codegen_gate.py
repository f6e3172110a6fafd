"""Codegen-fallback gate: fail any verification run that silently dropped
a stage to interpreted execution.

Why this exists: Spark's whole-stage codegen compiles each fused stage
with janino; a stage whose generated method exceeds the JVM's 64 KB
bytecode limit logs ``ERROR CodeGenerator ... Code grows beyond 64 KB``
and FALLS BACK to interpreted execution — results stay correct, so no
correctness gate sees it, but the stage runs 3-10x slower at scale. This
repo hit the class in rounds 5 (s2), 6 (d5 at n_bits=14) and again in
round 10 (d5's inferred-isnotnull filter, caught by the judge, not by our
gates) because detection was a MANUAL grep of bench stderr. This module
makes it structural: preflight's driver sim and bench.py both run inside
``StderrCodegenGate`` and exit nonzero if the pattern ever appears.

Mechanism: log4j writes to the JVM's stderr, which (local mode) is the
inherited OS fd 2 of this python process — python-level redirection of
``sys.stderr`` never sees it. The gate dup2()s a pipe over fd 2 and a
tee thread forwards every byte to the REAL stderr unchanged (progress
bars and logs stay live) while also scanning line-by-line for the
fallback signatures. Enter the gate BEFORE SparkSession creation so the
JVM child inherits the piped fd.
"""

from __future__ import annotations

import os
import sys
import threading

# Substrings (not regexes) that mark a silent codegen fallback. The first
# is the log4j tag every CodeGenerator compile failure carries; the rest
# pin the two concrete janino failure shapes we have hit, so the gate
# still fires if a future Spark demotes the log level of the first.
PATTERNS = (
    "ERROR CodeGenerator",
    "Code grows beyond 64 KB",
    "grows beyond 64 KiB",
    "InternalCompilerException",
)


def scan_text(text: str) -> list[str]:
    """Offending lines in ``text`` (deduped, order-preserving)."""
    hits: list[str] = []
    for line in text.splitlines():
        if any(p in line for p in PATTERNS) and line not in hits:
            hits.append(line)
    return hits


class StderrCodegenGate:
    """Context manager: tee OS fd 2 through a scanner.

    with StderrCodegenGate() as gate:
        ... create SparkSession, run queries ...
    if gate.hits: fail the run.

    ``hits`` is populated at __exit__ (and live as lines arrive). The tee
    thread forwards raw bytes immediately, so interactive output is
    unchanged. Safe to nest-use once per process; the JVM must be started
    INSIDE the context (fd inheritance happens at fork).
    """

    def __init__(self) -> None:
        self.hits: list[str] = []
        self._saved_fd: int | None = None
        self._read_fd: int | None = None
        self._thread: threading.Thread | None = None

    def __enter__(self) -> "StderrCodegenGate":
        sys.stderr.flush()
        self._saved_fd = os.dup(2)
        self._read_fd, write_fd = os.pipe()
        os.dup2(write_fd, 2)
        os.close(write_fd)
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()
        return self

    def _pump(self) -> None:
        assert self._read_fd is not None and self._saved_fd is not None
        buf = b""
        while True:
            try:
                chunk = os.read(self._read_fd, 65536)
            except OSError:
                break
            if not chunk:
                break
            os.write(self._saved_fd, chunk)
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for raw in lines:
                line = raw.decode("utf-8", "replace")
                if any(p in line for p in PATTERNS) and line not in self.hits:
                    self.hits.append(line)
        if buf:
            line = buf.decode("utf-8", "replace")
            if any(p in line for p in PATTERNS) and line not in self.hits:
                self.hits.append(line)

    def __exit__(self, *exc) -> None:
        if self._saved_fd is None:
            return  # idempotent: already exited (crash-path finally)
        sys.stderr.flush()
        # Restore the real fd 2; closing the pipe's last writer ends _pump.
        os.dup2(self._saved_fd, 2)
        if self._thread is not None:
            self._thread.join(timeout=10)
        if self._read_fd is not None:
            os.close(self._read_fd)
        os.close(self._saved_fd)
        self._saved_fd = self._read_fd = None

    def report(self, out=None) -> bool:
        """Print a verdict; True if the gate FAILED (hits found)."""
        out = out or sys.stderr
        if self.hits:
            print("CODEGEN GATE FAIL: silent interpreted fallback detected:",
                  file=out)
            for h in self.hits[:10]:
                print(f"  {h.strip()}", file=out)
            return True
        print("codegen gate: clean (no CodeGenerator fallback)", file=out)
        return False
