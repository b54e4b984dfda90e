"""Scaling sweep for the sharded FUSED path -> SCALING.json.

Sweeps the flagship sharded fused program (chip-partitioned chunk
streams, parallel/driver_fused.py) across device counts and mesh
topologies, asserting bit parity against the host oracle at every
point (SURVEY.md §2.10 / BASELINE config 5).

Two kinds of numbers are reported per topology:

  * STRUCTURAL scaling — the chunk counts of the chip-partitioned
    streams. The chunk scan is the serial axis of the program (every
    per-chunk fixed cost and collective lives on it), and per-chip
    event capacity is constant, so nc(1)/nc(p) is the
    hardware-independent speedup the partition delivers on a real
    slice where each chip's slice runs concurrently.
  * measured wall time — on this machine the sweep runs on XLA
    host-platform *virtual* devices (one real TPU chip is reachable;
    a pod slice is not), where all p simulated chips share one host
    and interpret-mode Pallas, so wall time does NOT show the
    concurrency; it validates that the program runs, stays exact, and
    keeps its collective volume bounded.

Usage:  python tools/scaling_sweep.py [matrix_stem=uni10k] [reps=1]
        [--legacy]       (sweep the legacy op-per-step sharded path)
        [--order=X]      (none|colamd|amd|auto; default colamd — the
                          banded 100K+ corpus members are BUILT for
                          the natural order, pass --order=none there)
        [--out=FILE]     (default SCALING.json at the repo root)
Writes: SCALING.json (or --out) at the repo root.
"""

import json
import os
import sys
import time

try:  # prefer the installed package (pip install -e .)
    import slip_lu_tpu  # noqa: F401
except ImportError:  # bare checkout: fall back to the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import slip_lu_tpu as slip
from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.matrix import Kind, Type
from slip_lu_tpu.parallel import make_mesh, make_mesh_2d


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    legacy = "--legacy" in sys.argv
    stem = args[0] if args else "uni10k"
    reps = int(args[1]) if len(args) > 1 else 1
    _order = next((a.split("=", 1)[1] for a in sys.argv[1:]
                   if a.startswith("--order=")), "colamd")
    _out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                 if a.startswith("--out=")), "SCALING.json")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    A = slip.read_triplet(os.path.join(root, "data/ExampleMats",
                                       f"{stem}_mat.txt"))
    b = slip.read_dense(os.path.join(root, "data/ExampleMats",
                                     f"{stem}_v.txt"))
    Ac = matrix_copy(A, Kind.CSC, Type.MPZ)
    nnz = int(Ac.p[Ac.n])
    from slip_lu_tpu.options import Ordering
    opts = slip.Options(order={
        "none": Ordering.NONE, "colamd": Ordering.COLAMD,
        "amd": Ordering.AMD, "auto": Ordering.AUTO}[_order])
    x_host = slip.backslash(A, b, Type.MPQ, opts)
    ana = analyze(Ac, opts)

    if legacy:
        from slip_lu_tpu.parallel.driver_sparse import (
            factorize_solve_sharded_sparse as run)
    else:
        from slip_lu_tpu.parallel.driver_fused import (
            factorize_solve_fused_sharded as run)

    topologies = [("1x1", make_mesh(jax.devices()[:1])),
                  ("1x2", make_mesh(jax.devices()[:2])),
                  ("1x4", make_mesh(jax.devices()[:4])),
                  ("1x8", make_mesh(jax.devices()[:8])),
                  ("2x4", make_mesh_2d(jax.devices()[:8], hosts=2)),
                  ("4x2", make_mesh_2d(jax.devices()[:8], hosts=4))]

    # --exec=1x1,1x8 executes (and parity-checks) only the listed
    # topologies; the rest report STRUCTURAL columns only, from the
    # driver's own planning phase (plan_sharded — identical stream
    # selection, nothing dispatched). Interpret-mode execution of a
    # 100K-nnz member costs tens of minutes per topology on the
    # virtual mesh; the structural metric is the hardware-independent
    # one (module docstring), so planning-only topologies lose nothing
    # but the (meaningless there) wall number.
    _exec = next((a.split("=", 1)[1].split(",") for a in sys.argv[1:]
                  if a.startswith("--exec=")), None)

    rows = []
    nc1 = None
    for name, mesh in topologies:
        pdev = int(mesh.devices.size)
        row = {"topology": name, "devices": pdev}
        if _exec is None or name in _exec:
            x = run(Ac, ana, b, mesh, opts)               # compile
            exact = all(x.x[i, j] == x_host.x[i, j]
                        for i in range(x.m) for j in range(x.n))
            t0 = time.perf_counter()
            for _ in range(reps):
                run(Ac, ana, b, mesh, opts)
            warm = (time.perf_counter() - t0) / reps
            row.update({"warm_s": round(warm, 4),
                        "nnz_per_s": round(nnz / warm, 1),
                        "bit_exact": exact})
        elif not legacy:
            from slip_lu_tpu.parallel.driver_fused import plan_sharded
            plan_sharded(Ac, ana, pdev, opts)
            row["planned_only"] = True
        if not legacy:
            cache = getattr(ana, "fused_shard_cache", None)
            if cache is not None:
                ses = cache[1][2]
                ncf = ses.factor.nchunks
                ncs = ses.solve.nchunks
                if pdev == 1:
                    nc1 = ncf + ncs
                row.update({
                    "factor_chunks": ncf, "solve_chunks": ncs,
                    "bc_capacity": int(ses.factor.CB),
                    "grouped": ses.ndet is not None,
                    "structural_speedup": round(
                        nc1 / (ncf + ncs), 3) if nc1 else 1.0})
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"matrix": stem, "n": int(Ac.n), "nnz": nnz, "reps": reps,
           "path": "legacy-sparse" if legacy else "fused-sharded",
           "device_kind": jax.devices()[0].platform,
           "note": "virtual host-platform devices: all simulated chips "
                   "share one host + interpret-mode Pallas, so wall "
                   "time hides the concurrency; structural_speedup "
                   "(serial chunk-scan shortening at constant per-chip "
                   "capacity) is the hardware-independent scaling "
                   "metric, with bit-exact parity asserted everywhere",
           "order": _order,
           "sweep": rows}
    with open(os.path.join(root, _out), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {_out}")


if __name__ == "__main__":
    main()
