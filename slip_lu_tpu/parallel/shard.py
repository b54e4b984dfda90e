"""Mesh construction and block-row padding utilities.

The distribution model (SURVEY.md §7, BASELINE.json config 4): a 1-D device
mesh axis ``"rows"`` over which the n×n working limb tensor is partitioned
by block rows. Padding embeds A in the block-diagonal matrix [[A,0],[0,I]]
so n is a multiple of the device count; IPGE on the padded matrix computes
the identical minors for the original block (the identity block's pivots
all equal det(A) after step n), so factors and solutions are unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

ROWS_AXIS = "rows"
DCN_AXIS = "dcn"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'rows'."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (ROWS_AXIS,))


def make_mesh_2d(devices: Optional[Sequence[jax.Device]] = None,
                 hosts: int = 1) -> Mesh:
    """2-D ('dcn', 'rows') mesh: `hosts` groups x chips-per-group.

    The leading axis models the slow inter-host (DCN) dimension; the
    trailing axis the fast intra-host ICI ring. Row ownership is cyclic
    over the *flattened* device index (dcn-major), so results are
    bit-identical to the same device count on a 1-D mesh — only the
    collective routing changes (XLA reduces within 'rows' over ICI,
    then across 'dcn' over DCN).
    """
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) % hosts:
        raise ValueError(f"{len(devs)} devices not divisible by {hosts} hosts")
    grid = np.asarray(devs).reshape(hosts, len(devs) // hosts)
    return Mesh(grid, (DCN_AXIS, ROWS_AXIS))


def mesh_axes(mesh: Mesh) -> tuple:
    """The mesh's device axes as a tuple usable as a collective axis name."""
    return tuple(mesh.axis_names)


def pad_to_multiple(S: np.ndarray, M: np.ndarray, qcols: np.ndarray,
                    p: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Embed (S, M) in [[A,0],[0,I]] so n is a multiple of p.

    Returns (S_pad, M_pad, qcols_pad, n_pad). The identity block's rows are
    zero in every original column, so they are never eligible pivots before
    step n, and its pivots after step n all equal rho_{n-1} = det(A) —
    back-substitution scaling is unchanged. qcols is extended with the new
    (identity) column indices so DIAGONAL pivoting still matches.
    """
    n = S.shape[0]
    n_pad = ((n + p - 1) // p) * p
    if n_pad == n:
        return S, M, qcols, n
    W = M.shape[-1]
    e = n_pad - n
    S2 = np.zeros((n_pad, n_pad), dtype=np.int32)
    M2 = np.zeros((n_pad, n_pad, W), dtype=np.int32)
    S2[:n, :n] = S
    M2[:n, :n] = M
    for t in range(e):
        S2[n + t, n + t] = 1
        M2[n + t, n + t, 0] = 1
    q2 = np.concatenate([np.asarray(qcols, np.int32),
                         np.arange(n, n_pad, dtype=np.int32)])
    return S2, M2, q2, n_pad
