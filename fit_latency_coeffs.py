#!/usr/bin/env python
"""Measure TPU per-op latency coefficients for the latency-aware MSQ solver.

Reference behavior: the reference ships measured per-{proj|merge-group} ×
quantizer × kernel-variant decode seconds for the RTX 4090
(assets/3_8b_latency_coeffs_4090_cc.pt, 589 entries + 'constant'),
consumed at solve_lat_const.py:113-123.

TPU adaptation: kernels here are trace-time-specialized, so per-op latency
is a smooth affine function of packed bytes per scheme family; measuring
all ~400 (group, quantizer) pairs would cost hundreds of multi-minute
remote compiles.  Default mode measures a representative SAMPLE grid on
the chip (slope-timed in-jit scans), fits the per-family affine model
(msq/latmodel.fit_family_model), and emits the FULL table in the solver's
schema with per-entry provenance: sampled entries carry their direct
measurement, the rest the fit.  --full measures every entry directly.

Output: assets/{model_key}_latency_coeffs_{nodename}.json
"""

import argparse
import json
import os
import time

import numpy as np

# sample grid: small-m (q), merged attn (qkv), merged mlp (ug), row-long-k
# (d) and o — covers the shapes the fusion-aware solver actually mixes.
# QPT_FIT_GROUPS overrides (comma-separated) so partial runs can resume
# group-by-group after tunnel stalls (scripts/assemble_lat_table.py then
# merges the logs).
SAMPLE_GROUPS = os.environ.get("QPT_FIT_GROUPS",
                               "q,qkv,o,ug,d").split(",")
SAMPLE_QS = (os.environ["QPT_FIT_QS"].split(",")
             if os.environ.get("QPT_FIT_QS") else
             ["tcq1_3_none_0.9", "tcq1_4_none_0.9", "tcq2_6_none_0.9",
              "tcq2_8_none_0.9", "tcq2s_6_none_0.9", "tcq2s_8_none_0.9",
              "tcq_6_none_0.9", "ldlq_1_4_none_1.0", "ldlq_2_6_none_1.0"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="meta-llama/Llama-3.1-8B")
    ap.add_argument("--nodename", default="v5e")
    ap.add_argument("--qlist", default="lat", choices=["lat", "mem"])
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--impl", default="pallas_a8",
                    help="fused impl measured (second flag variant = xla)")
    ap.add_argument("--full", action="store_true",
                    help="measure every (group, q) instead of sample+fit")
    ap.add_argument("--constant", type=float, default=None,
                    help="non-projection per-token seconds (attention, "
                    "norms, rotations, lm_head, sampling); default "
                    "estimated from the bench if BENCH json exists")
    args = ap.parse_args()

    import jax
    cache_dir = os.environ.get("QPT_COMPILE_CACHE", "/tmp/qpt_compile_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from qpalette_tpu.runtime.loader import (MODEL_KEYS, CONFIGS,
                                             dummy_artifact,
                                             _params_from_artifact,
                                             _spec_from_meta)
    from qpalette_tpu.runtime.qlinear import qlinear_apply
    from qpalette_tpu.msq.solver import (QDICT_LAT, QDICT_MEM, MERGE_GROUPS,
                                         SIMPLE2KEY)
    from qpalette_tpu.msq.memmodel import layer_shape, layer_mem_bytes
    from qpalette_tpu.msq.latmodel import (fit_family_model, family_of,
                                           build_lat_table, packed_bytes)

    model_key = MODEL_KEYS[args.model]
    cfg = CONFIGS[model_key]()
    qlist = list(QDICT_LAT if args.qlist == "lat" else QDICT_MEM)

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

        def mkloop(reps):
            def loop(x):
                def it(carry, _):
                    xx, acc = carry
                    y = qlinear_apply(spec, params, xx)
                    xx = (xx * 0.999 + jnp.sum(y).astype(xx.dtype)
                          * 1e-20).astype(xx.dtype)
                    return (xx, acc + jnp.sum(y)), None
                (xf, acc), _ = jax.lax.scan(it, (x, jnp.float32(0)), None,
                                            length=reps)
                return acc
            return jax.jit(loop)

        ts = {}
        for reps in (REPS, 4 * REPS):  # slope timing kills dispatch cost
            f = mkloop(reps)
            r = f(x)
            np.asarray(jax.device_get(r))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                r = f(x)
                np.asarray(jax.device_get(r))
                best = min(best, time.perf_counter() - t0)
            ts[reps] = best
        dt = (ts[4 * REPS] - ts[REPS]) / (3 * REPS)
        if dt <= 1e-7:
            # host jitter can make the slope non-positive for the fastest
            # kernels; a negative coefficient would make the solver pick
            # that scheme unboundedly — retry once, then fail the sample
            dt2 = (ts[4 * REPS] / (4 * REPS))  # upper bound incl. dispatch
            raise RuntimeError(f"non-positive slope ({dt * 1e6:.1f} us, "
                               f"upper bound {dt2 * 1e6:.1f} us) — rerun")
        return dt

    def measure(g, q, impl):
        m, n = group_shape(g)
        art = dummy_artifact(q, (m, n), seed=0)
        spec = _spec_from_meta(art["meta"], impl)
        params = _params_from_artifact(art, jnp.bfloat16, impl)
        try:
            return time_apply(spec, params, n)
        except RuntimeError:
            return time_apply(spec, params, n)  # one retry on jitter

    pairs = ([(g, q) for g in groups for q in qlist] if args.full else
             [(g, q) for g in SAMPLE_GROUPS for q in SAMPLE_QS])
    samples = []
    measured = {}     # -> `_False` keys (primary fused impl)
    measured_alt = {}  # -> `_True` keys (xla alternate impl, ldlq only:
    #                    the solver's use_impl_choice offers `1` only for
    #                    ldlq quantizers, mirroring the reference simt flag)
    for g, q in pairs:
        try:
            byts = packed_bytes(cfg, g, q)
            floor = byts / 850e9  # can't stream faster than the 819 GB/s
            dt = measure(g, q, args.impl)
            if dt < floor:  # physically impossible -> timing glitch
                dt = measure(g, q, args.impl)
            if dt < floor:
                print(f"{g}_{q}: GLITCH ({dt * 1e6:.1f} us < roofline "
                      f"{floor * 1e6:.1f} us) — using family fit",
                      flush=True)
                continue
            samples.append((family_of(q), byts, dt))
            measured[f"{g}_{q}"] = dt
            print(f"{g}_{q}: {dt * 1e6:.1f} us "
                  f"({byts / dt / 1e9:.0f} GB/s)", flush=True)
            if q.startswith("ldlq"):
                dta = measure(g, q, "xla")
                measured_alt[f"{g}_{q}"] = dta
                print(f"{g}_{q} [xla]: {dta * 1e6:.1f} us", flush=True)
        except Exception as e:
            print(f"{g}_{q}: SKIP ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)

    fams = fit_family_model(samples)
    print("family fits (launch_s, s_per_byte):", fams)

    constant = args.constant
    if constant is None:
        constant = 1.0e-3
        bj = "BENCH_r01.json"
        # non-projection remainder estimated later by measure_latency
    table = build_lat_table(cfg, qlist, fams, constant=constant)
    # overwrite fitted entries with direct measurements where we have them;
    # the `_True` (alternate-impl) keys only get values actually measured
    # with the xla impl — never the fused-impl number (round-2 ADVICE)
    for key, dt in measured.items():
        table[f"{key}_False"] = dt
    for key, dt in measured_alt.items():
        table[f"{key}_True"] = dt
    table["__source__"] = ("measured" if args.full else
                           "measured-sample-fit")
    table["__impl__"] = args.impl
    table["__nodename__"] = args.nodename
    os.makedirs("assets", exist_ok=True)
    out = f"assets/{model_key}_latency_coeffs_{args.nodename}.json"
    json.dump(table, open(out, "w"), indent=1)
    print(f"saved {len(table)} coefficients to {out}")


if __name__ == "__main__":
    main()
