"""Python-script execution + upload store (SURVEY.md §2.1 S10/S11).

The reference's extensibility model is whole uploaded Python scripts
run via subprocess with a 300 s timeout, env/PYTHONPATH injection and
output capture (web_scheduler.py:736-829); uploads land in
`uploads/` after filename sanitization (:4262-4283, regex :3637).
This is orchestrator-level by design — arbitrary user code stays in a
child process, never inside a Spark task — so the Spark build keeps
the same shape (a heavy script would itself be a `spark-submit`).
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys
import time
from dataclasses import dataclass

DEFAULT_TIMEOUT_S = 300  # web_scheduler.py:769

# F15 filename sanitization (web_scheduler.py:3637-3638)
_UNSAFE = re.compile(r'[\\/*?:"<>|]')


def sanitize_filename(name: str) -> str:
    """Strip filesystem-unsafe characters — the reference's exporter
    regex `re.sub(r'[\\\\/*?:"<>|]', "", name)`."""
    return _UNSAFE.sub("", name)


@dataclass(frozen=True)
class ScriptResult:
    success: bool
    returncode: int
    stdout: str
    stderr: str
    seconds: float
    timed_out: bool = False


def execute_script(
    path: str,
    timeout_s: int = DEFAULT_TIMEOUT_S,
    env: dict[str, str] | None = None,
    python: str = sys.executable,
) -> ScriptResult:
    """Run a Python script in a child process, reference-compatible:
    stdout/stderr captured for the audit log (task_logs get the
    combined output, web_scheduler.py:789-792), PYTHONPATH gets the
    script's own directory (:757-767), hard timeout kills the child
    (:769-776)."""
    script_dir = os.path.dirname(os.path.abspath(path))
    child_env = dict(os.environ)
    if env:
        child_env.update(env)
    child_env["PYTHONPATH"] = (
        script_dir + os.pathsep + child_env.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [python, path],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env=child_env,
            cwd=script_dir,
        )
    except subprocess.TimeoutExpired as exc:
        return ScriptResult(
            success=False,
            returncode=-1,
            stdout=(exc.stdout or b"").decode() if isinstance(exc.stdout, bytes) else (exc.stdout or ""),
            stderr=f"timeout after {timeout_s}s",
            seconds=round(time.perf_counter() - t0, 3),
            timed_out=True,
        )
    return ScriptResult(
        success=proc.returncode == 0,
        returncode=proc.returncode,
        stdout=proc.stdout,
        stderr=proc.stderr,
        seconds=round(time.perf_counter() - t0, 3),
    )


def store_upload(src_path: str, uploads_dir: str) -> str:
    """S11 upload store: place a script into the uploads directory
    under its sanitized basename; returns the stored path."""
    os.makedirs(uploads_dir, exist_ok=True)
    name = sanitize_filename(os.path.basename(src_path))
    if not name.endswith(".py"):
        raise ValueError(f"only .py uploads are accepted, got {name!r}")
    dest = os.path.join(uploads_dir, name)
    shutil.copyfile(src_path, dest)
    return dest
