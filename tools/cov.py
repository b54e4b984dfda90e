"""Line-coverage harness for the test suite (Tcov-parity, SURVEY §2.8/§4).

The reference ships Tcov: a statement-coverage + malloc-failure-injection
harness. The failure-injection analogue lives in
tests/test_overflow_injection.py; this tool supplies the coverage
measurement without external deps (coverage.py isn't in the image):

  * executable lines per module come from the compiled code objects
    (co_lines() of every nested code object — the exact set the
    interpreter can attribute), not a text heuristic;
  * covered lines are recorded with sys.monitoring LINE events
    (PEP 669, stdlib) — near-zero overhead vs sys.settrace;
  * each test FILE runs in its own subprocess (this machine's XLA
    compile helper aborts single processes that accumulate ~400+
    compiles — see ROADMAP "suite crash") and the sets merge.

Usage: python tools/cov.py [-m EXPR]      (default: -m "not slow")
Writes COVERAGE.md at the repo root.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "slip_lu_tpu")

_RUNNER = r"""
import json, os, sys
sys.path.insert(0, %(root)r)
os.chdir(%(root)r)
covered = {}
PKG = %(pkg)r

import sys as _sys
mon = _sys.monitoring
TOOL = mon.PROFILER_ID
mon.use_tool_id(TOOL, "slipcov")

def _on_line(code, line):
    f = code.co_filename
    if f.startswith(PKG):
        covered.setdefault(f, set()).add(line)
    else:
        return mon.DISABLE

mon.register_callback(TOOL, mon.events.LINE, _on_line)
mon.set_events(TOOL, mon.events.LINE)

import pytest
# -o addopts= clears pytest.ini's "-n 2 --dist loadfile" (xdist would
# run tests in worker subprocesses, out of this monitor's reach)
rc = pytest.main([%(target)r, "-q", "-p", "no:cacheprovider",
                  "-o", "addopts=", "-m", %(mark)r])
mon.set_events(TOOL, 0)
with open(%(out)r, "w") as fh:
    json.dump({k: sorted(v) for k, v in covered.items()}, fh)
raise SystemExit(0 if rc in (0, 5) else rc)
"""


def executable_lines(path):
    """Line numbers the interpreter can execute, from code objects."""
    with open(path, "r") as fh:
        src = fh.read()
    lines = set()
    stack = [compile(src, path, "exec")]
    while stack:
        co = stack.pop()
        for _, _, ln in co.co_lines():
            if ln is not None:
                lines.add(ln)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def main():
    mark = "not slow"
    args = sys.argv[1:]
    if args[:1] == ["-m"]:
        mark = args[1]
    test_files = sorted(
        f for f in os.listdir(os.path.join(ROOT, "tests"))
        if f.startswith("test_") and f.endswith(".py"))
    merged = {}
    for i, tf in enumerate(test_files):
        out = f"/tmp/slipcov_{i}.json"
        code = _RUNNER % {
            "root": ROOT, "pkg": PKG, "mark": mark,
            "target": os.path.join("tests", tf), "out": out}
        env = dict(os.environ)
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=3600)
        if not os.path.exists(out):
            print(f"{tf}: runner produced no data (rc={r.returncode})",
                  file=sys.stderr)
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            continue
        with open(out) as fh:
            data = json.load(fh)
        os.unlink(out)
        for f, ls in data.items():
            merged.setdefault(f, set()).update(ls)
        print(f"[{i + 1}/{len(test_files)}] {tf}: "
              f"{sum(len(v) for v in data.values())} lines", flush=True)

    rows = []
    tot_exec = tot_cov = 0
    for dirpath, _, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            ex = executable_lines(path)
            cov = merged.get(path, set()) & ex
            tot_exec += len(ex)
            tot_cov += len(cov)
            rel = os.path.relpath(path, ROOT)
            pct = 100.0 * len(cov) / len(ex) if ex else 100.0
            rows.append((rel, len(ex), len(cov), pct))
    rows.sort(key=lambda r: r[3])
    pct_all = 100.0 * tot_cov / max(tot_exec, 1)
    with open(os.path.join(ROOT, "COVERAGE.md"), "w") as fh:
        fh.write("# Test-suite line coverage (Tcov-parity harness)\n\n")
        fh.write(f"Marker: `{mark}`. Executable lines from code-object "
                 "`co_lines()`; recorded via `sys.monitoring`; each test "
                 "file in its own process (tools/cov.py).\n\n")
        fh.write(f"**Total: {tot_cov}/{tot_exec} = {pct_all:.1f}%**\n\n")
        fh.write("| file | exec | covered | % |\n|---|---|---|---|\n")
        for rel, ex, cov, pct in rows:
            fh.write(f"| {rel} | {ex} | {cov} | {pct:.1f}% |\n")
    print(f"TOTAL {tot_cov}/{tot_exec} = {pct_all:.1f}% -> COVERAGE.md")


if __name__ == "__main__":
    main()
