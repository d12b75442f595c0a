#!/usr/bin/env python
"""Round-4 sweep: cut grid-step overhead on the small-m sum2 shapes.

diag_decode_breakdown (r4) shows qkv (6144x4096) at 364 Gw/s and o
(4096x4096) at 600 Gw/s vs ug's 1931 — launch/grid-step-bound, not
stream-bound (qkv: 24 grid steps at wm=128).  Candidates: wider wm (384 =
whole m for qkv -> gm=1) and bigger tk (fewer k-steps).
"""
import itertools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from qpalette_tpu.kernels import formats as kf
from qpalette_tpu.kernels import fused
import proto_fold
proto_fold.REPS_LO, proto_fold.REPS_HI = 200, 1200
from proto_fold import timeit

key = jax.random.PRNGKey(0)

SHAPES = [("qkv", 6144, 4096, 6), ("o", 4096, 4096, 6),
          ("down", 4096, 14336, 8), ("ug", 28672, 4096, 6)]
GRID = {
    "tk": (32, 64, 128),
    "wm": (128, 256, 384),
    "cc": (8,),
    "pingpong": (True, False),
}


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, m, k, KV in SHAPES:
        if only and name != only:
            continue
        ntiles = (m // 16) * (k // 16)
        tr = jax.random.randint(key, (ntiles, 4 * KV), 0, 2 ** 31 - 1,
                                jnp.int32).astype(jnp.uint32)
        trpl = kf.tcq2_planar_weights(tr, m, k, KV)
        x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
        best = (1e18, None)
        print(f"== sum2 KV={KV} {name} ({m}x{k}) ==", flush=True)
        for tk, wm, cc, pp in itertools.product(*GRID.values()):
            if (m // 16) % wm:
                continue
            if cc > tk or (k // 16) % tk:
                continue
            # VMEM estimate: tr block (tk, NP*8+dense, wm) dbl-buffered +
            # scratch (cc|tk)*8 rows x 16*wm u32
            NP = kf.planar_n_planes(KV)
            trb = tk * NP * 8 * wm * 4 * 2
            rows = (cc if pp else tk) * 8
            scr = rows * 16 * wm * 4 * (2 if pp else 1)
            if trb + scr > 13 << 20:
                continue
            tune = (("tk", tk), ("wm", wm), ("cc", cc), ("pingpong", pp))
            try:
                t = timeit(lambda xx, tt: fused.tcq2_decode_matmul(
                    xx, tt, KV, m, k, a8=True, mode="sum2", tune=tune),
                    x, trpl)
            except Exception as e:
                print(f"  tk{tk} wm{wm} cc{cc} pp{int(pp)}: FAIL "
                      f"{type(e).__name__} {str(e)[:60]}", flush=True)
                continue
            gw = m * k / t / 1e3
            mark = ""
            if 0 < t < best[0]:
                best = (t, tune)
                mark = " *"
            print(f"  tk{tk} wm{wm} cc{cc} pp{int(pp)}: {t:8.1f} us "
                  f"{gw:7.1f} Gw/s{mark}", flush=True)
        t, tune = best
        print(f"BEST {name}: {dict(tune)} {m * k / t / 1e3:.1f} Gw/s "
              f"({t:.1f} us)", flush=True)


if __name__ == "__main__":
    main()
