"""Scaling sweep for the sharded sparse path -> SCALING.json.

Measures warm exact-solve wall time for the cyclic block-row sharded
sparse program across device counts (1/2/4/8) and mesh topologies
(1-D 'rows' vs 2-D 'dcn' x 'rows'), asserting bit parity against the
host oracle at every point (SURVEY.md §2.10 / BASELINE config 5).

On this machine the sweep runs on XLA host-platform *virtual* devices
(one real TPU chip is reachable; a pod slice is not), so absolute
numbers model the program structure, not ICI/DCN bandwidth — the same
harness on a real slice produces the production table.

Usage:  python tools/scaling_sweep.py [matrix_stem=grid16] [reps=3]
Writes: SCALING.json at the repo root.
"""

import json
import os
import sys
import time

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
from slip_lu_tpu.parallel.driver_sparse import factorize_solve_sharded_sparse


def main() -> None:
    stem = sys.argv[1] if len(sys.argv) > 1 else "grid16"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    A = slip.read_triplet(os.path.join(root, "data/ExampleMats",
                                       f"{stem}_mat.txt"))
    b = slip.read_dense(os.path.join(root, "data/ExampleMats",
                                     f"{stem}_v.txt"))
    Ac = matrix_copy(A, Kind.CSC, Type.MPZ)
    nnz = int(Ac.p[Ac.n])
    opts = slip.Options()
    x_host = slip.backslash(A, b, Type.MPQ, opts)
    ana = analyze(Ac, opts)

    topologies = [("1x1", make_mesh(jax.devices()[:1])),
                  ("1x2", make_mesh(jax.devices()[:2])),
                  ("1x4", make_mesh(jax.devices()[:4])),
                  ("1x8", make_mesh(jax.devices()[:8])),
                  ("2x4", make_mesh_2d(jax.devices()[:8], hosts=2)),
                  ("4x2", make_mesh_2d(jax.devices()[:8], hosts=4))]

    rows = []
    base = None
    for name, mesh in topologies:
        x = factorize_solve_sharded_sparse(Ac, ana, b, mesh, opts)  # compile
        exact = all(x.x[i, j] == x_host.x[i, j]
                    for i in range(x.m) for j in range(x.n))
        t0 = time.perf_counter()
        for _ in range(reps):
            factorize_solve_sharded_sparse(Ac, ana, b, mesh, opts)
        warm = (time.perf_counter() - t0) / reps
        rate = nnz / warm
        if name == "1x1":
            base = rate
        rows.append({"topology": name, "devices": int(mesh.devices.size),
                     "warm_s": round(warm, 4),
                     "nnz_per_s": round(rate, 1),
                     "efficiency_vs_1dev": round(rate / base, 4),
                     "bit_exact": exact})
        print(json.dumps(rows[-1]))

    out = {"matrix": stem, "n": int(Ac.n), "nnz": nnz, "reps": reps,
           "device_kind": jax.devices()[0].platform,
           "note": "virtual host-platform devices; collective latency and "
                   "host planning dominate at this scale — the harness, "
                   "parity, and topology coverage are the deliverable",
           "sweep": rows}
    with open(os.path.join(root, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING.json")


if __name__ == "__main__":
    main()
