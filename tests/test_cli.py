"""CLI front-end tests (reference parity: Demo/SLIPLU.c as integration
tests over ExampleMats, SURVEY.md §4 tier 2)."""

import os

import numpy as np
import pytest

from slip_lu_tpu.cli import main
from slip_lu_tpu.io import read_dense

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "ExampleMats")


def _mat(name):
    return os.path.join(DATA, name)


def test_cli_solve_with_rhs(capsys, tmp_path):
    out = tmp_path / "x.txt"
    rc = main([_mat("dense10_mat.txt"), _mat("dense10_v.txt"),
               "--check", "-o", str(out)])
    assert rc == 0
    assert "verified exactly" in capsys.readouterr().out
    x = read_dense(str(out))
    assert x.m == 10


def test_cli_self_test_ones(capsys):
    # without a RHS, b = A @ ones, so the exact solution must be all ones
    rc = main([_mat("arrow25_mat.txt"), "--check"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l and "check:" not in l]
    assert all(l.strip() == "1" for l in lines)
    assert len(lines) == 25


@pytest.mark.parametrize("pivot", ["smallest", "diagonal", "first",
                                   "tol-smallest", "tol-largest", "largest"])
def test_cli_all_pivots(pivot, capsys):
    rc = main([_mat("dense10_mat.txt"), _mat("dense10_v.txt"),
               "--pivot", pivot, "--check"])
    assert rc == 0
    assert "verified exactly" in capsys.readouterr().out


@pytest.mark.parametrize("order", ["none", "colamd", "amd"])
def test_cli_all_orders(order, capsys):
    rc = main([_mat("grid8_mat.txt"), _mat("grid8_v.txt"),
               "--order", order, "--check"])
    assert rc == 0


def test_cli_fp64_output(capsys, tmp_path):
    out = tmp_path / "x.txt"
    rc = main([_mat("dense10_mat.txt"), _mat("dense10_v.txt"),
               "--out-type", "fp64", "-o", str(out)])
    assert rc == 0
    x = read_dense(str(out))
    assert x.m == 10


def test_cli_missing_file():
    rc = main(["/nonexistent/file.txt"])
    assert rc == 1


def test_cli_singular(tmp_path):
    mat = tmp_path / "sing.txt"
    mat.write_text("2 2 4\n1 1 1\n1 2 2\n2 1 2\n2 2 4\n")
    rc = main([str(mat)])
    assert rc == 2


def test_cli_sharded_backend(capsys):
    rc = main([_mat("dense10_mat.txt"), _mat("dense10_v.txt"),
               "--backend", "sharded", "--check"])
    assert rc == 0
    assert "verified exactly" in capsys.readouterr().out


def test_cli_fused_backend(capsys):
    rc = main([_mat("tiny4_mat.txt"), _mat("tiny4_v.txt"),
               "--backend", "tpu-fused", "--check"])
    assert rc == 0
    assert "verified exactly" in capsys.readouterr().out


def test_module_entry_subprocess():
    # `python -m slip_lu_tpu` — covers __main__.py; also the installed
    # console form (`sliplu`, pyproject.toml [project.scripts]) since both
    # call cli.main. Runs on CPU so the test never touches the TPU tunnel.
    import subprocess
    import sys
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    root = os.path.join(os.path.dirname(__file__), "..")
    res = subprocess.run(
        [sys.executable, "-m", "slip_lu_tpu",
         os.path.join("data", "ExampleMats", "arrow25_mat.txt"), "--check"],
        cwd=root, env=env, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr
    lines = [l for l in res.stdout.splitlines() if l and "check:" not in l]
    assert all(l.strip() == "1" for l in lines) and len(lines) == 25
