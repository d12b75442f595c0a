#!/usr/bin/env python
"""Measure TPU per-op latency coefficients for the latency-aware MSQ solver.

Reference behavior: the reference ships measured per-{proj|merge-group} ×
quantizer × kernel-variant decode seconds for the RTX 4090
(assets/3_8b_latency_coeffs_4090_cc.pt, 589 entries + 'constant').  This
script regenerates that table natively: it times the fused Pallas kernels
(and the XLA dequant fallback as the second impl variant) for every group
shape of the target model on the attached TPU chip, amortizing dispatch
overhead with an in-jit scan.

Output: assets/{model_key}_latency_coeffs_{nodename}.json
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="meta-llama/Llama-3.1-8B")
    ap.add_argument("--nodename", default="v5e")
    ap.add_argument("--qlist", default="lat",
                    choices=["lat", "mem"],
                    help="candidate set (QDICT_LAT or QDICT_MEM)")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--impls", default="pallas",
                    help="comma list: pallas,xla")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from qpalette_tpu.runtime.loader import (MODEL_KEYS, CONFIGS,
                                             dummy_artifact,
                                             _params_from_artifact,
                                             _spec_from_meta)
    from qpalette_tpu.runtime.qlinear import qlinear_apply
    from qpalette_tpu.msq.solver import (QDICT_LAT, QDICT_MEM, MERGE_GROUPS,
                                         SIMPLE2KEY)
    from qpalette_tpu.msq.memmodel import layer_shape

    model_key = MODEL_KEYS[args.model]
    cfg = CONFIGS[model_key]()
    qlist = list(QDICT_LAT if args.qlist == "lat" else QDICT_MEM)
    impls = args.impls.split(",")

    groups = list("qkvougd") + list(MERGE_GROUPS)

    def group_shape(g):
        bases = MERGE_GROUPS.get(g, (g,))
        shapes = [layer_shape(cfg, SIMPLE2KEY[b]) for b in bases]
        n = shapes[0][1]
        assert all(s[1] == n for s in shapes)
        return sum(s[0] for s in shapes), n

    REPS = args.reps

    def time_apply(spec, params, n):
        x = jnp.zeros((1, n), jnp.bfloat16)

        def loop(x):
            def it(carry, _):
                xx, acc = carry
                y = qlinear_apply(spec, params, xx)
                xx = (xx * 0.999
                      + jnp.sum(y).astype(xx.dtype) * 1e-20).astype(xx.dtype)
                return (xx, acc + jnp.sum(y)), None
            (xf, acc), _ = jax.lax.scan(it, (x, jnp.float32(0)), None,
                                        length=REPS)
            return acc

        f = jax.jit(loop)
        r = f(x)
        np.asarray(jax.device_get(r))
        t0 = time.perf_counter()
        for _ in range(3):
            r = f(x)
        np.asarray(jax.device_get(r))
        return (time.perf_counter() - t0) / 3 / REPS

    coeffs = {}
    for g in groups:
        m, n = group_shape(g)
        for q in qlist:
            for impl in impls:
                flag = "True" if impl == "xla" else "False"
                key = f"{g}_{q}_{flag}"
                try:
                    art = dummy_artifact(q, (m, n), seed=0)
                    spec = _spec_from_meta(art["meta"], impl)
                    params = _params_from_artifact(art, jnp.bfloat16, impl)
                    dt = time_apply(spec, params, n)
                    coeffs[key] = dt
                    print(f"{key}: {dt * 1e6:.1f} us", flush=True)
                except Exception as e:
                    print(f"{key}: SKIP ({type(e).__name__}: "
                          f"{str(e)[:120]})", flush=True)

    # constant term: embeddings + lm_head + attention + norms of one decode
    # step, approximated as the non-projection remainder; measured later by
    # measure_latency.py — seed with a small default here.
    coeffs["constant"] = 1.0e-3
    os.makedirs("assets", exist_ok=True)
    out = f"assets/{model_key}_latency_coeffs_{args.nodename}.json"
    json.dump(coeffs, open(out, "w"), indent=1)
    print(f"saved {len(coeffs)} coefficients to {out}")


if __name__ == "__main__":
    main()
