"""SRS / setup checkpointing (SURVEY.md §5 'checkpoint/resume' — new work;
the reference has no serialization beyond limb dumps).

KZG setups are saved as compressed .npz of limb planes with a
format/version header plus a sha256 content digest over the concatenated
limb arrays; loading verifies the digest so corrupted or truncated limb
data is rejected instead of silently producing a wrong SRS.  Orbax-style
sharded checkpoints can layer on top; the format here is the portable
single-file interchange.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import jax.numpy as jnp

from ..params import CURVES
from .kzg import KZGSetup

_ARRAY_KEYS = (
    "tau_g1_x", "tau_g1_y", "tau_g1_inf",
    "lag_x", "lag_y", "lag_inf",
    "g2_x", "g2_y", "g2_inf",
    "tau_g2_x", "tau_g2_y", "tau_g2_inf",
)


def _digest(arrays: dict) -> str:
    """sha256 over every limb array's shape + raw bytes, in key order."""
    h = hashlib.sha256()
    for k in _ARRAY_KEYS:
        a = np.ascontiguousarray(arrays[k])
        h.update(k.encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def save_setup(path: str, setup: KZGSetup) -> None:
    arrays = {
        "tau_g1_x": np.asarray(setup.tau_g1[0]),
        "tau_g1_y": np.asarray(setup.tau_g1[1]),
        "tau_g1_inf": np.asarray(setup.tau_g1[2]),
        "lag_x": np.asarray(setup.lagrange_tau_g1[0]),
        "lag_y": np.asarray(setup.lagrange_tau_g1[1]),
        "lag_inf": np.asarray(setup.lagrange_tau_g1[2]),
        "g2_x": np.asarray(setup.g2[0]),
        "g2_y": np.asarray(setup.g2[1]),
        "g2_inf": np.asarray(setup.g2[2]),
        "tau_g2_x": np.asarray(setup.tau_g2[0]),
        "tau_g2_y": np.asarray(setup.tau_g2[1]),
        "tau_g2_inf": np.asarray(setup.tau_g2[2]),
    }
    meta = {
        "curve": setup.curve.name,
        "log2_size": setup.log2_size,
        "version": 2,
        "sha256": _digest(arrays),
    }
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def load_setup(path: str) -> KZGSetup:
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    if meta["version"] not in (1, 2):
        raise ValueError(f"unknown SRS format version {meta['version']}")
    if "sha256" in meta:
        got = _digest({k: z[k] for k in _ARRAY_KEYS})
        if got != meta["sha256"]:
            raise ValueError(
                "SRS checkpoint content digest mismatch (corrupted file?)"
            )
    curve = CURVES[meta["curve"]]

    def t(*names):
        return tuple(jnp.asarray(z[n]) for n in names)

    return KZGSetup(
        curve=curve,
        log2_size=meta["log2_size"],
        tau_g1=t("tau_g1_x", "tau_g1_y", "tau_g1_inf"),
        lagrange_tau_g1=t("lag_x", "lag_y", "lag_inf"),
        g2=t("g2_x", "g2_y", "g2_inf"),
        tau_g2=t("tau_g2_x", "tau_g2_y", "tau_g2_inf"),
    )
