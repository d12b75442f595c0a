#!/usr/bin/env python
"""Autotune (tk, wm, cc, pingpong) for the sum2/dualmad fused kernels at
the 8B bench shapes; prints the best config per (shape, KV, mode)."""
import itertools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from qpalette_tpu.kernels import formats as kf
from qpalette_tpu.kernels import fused
import proto_fold
# short kernels + tunnel jitter need long in-jit bursts for a clean slope
proto_fold.REPS_LO, proto_fold.REPS_HI = 200, 1200
from proto_fold import timeit

key = jax.random.PRNGKey(0)

SHAPES = [("qkv", 6144, 4096), ("o", 4096, 4096),
          ("ug", 28672, 4096), ("down", 4096, 14336)]
CONFIGS = [(6, "sum2"), (8, "sum2")]
GRID = {
    "tk": (32, 16, 64),
    "wm": (128, 256),
    "cc": (8, 16, 4),
    "pingpong": (False, True),
}


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for KV, mode in CONFIGS:
        for name, m, k in SHAPES:
            if only and name != only:
                continue
            ntiles = (m // 16) * (k // 16)
            tr = jax.random.randint(key, (ntiles, 4 * KV), 0, 2 ** 31 - 1,
                                    jnp.int32).astype(jnp.uint32)
            trpl = kf.tcq2_planar_weights(tr, m, k, KV)
            x = jax.random.normal(key, (1, k), jnp.float32).astype(
                jnp.bfloat16)
            best = (1e18, None)
            print(f"== {mode} KV={KV} {name} ({m}x{k}) ==", flush=True)
            for tk, wm, cc, pp in itertools.product(*GRID.values()):
                if (m // 16) % wm and wm != 128:
                    continue
                if cc > tk or (k // 16) % tk:
                    continue
                tune = (("tk", tk), ("wm", wm), ("cc", cc),
                        ("pingpong", pp))
                try:
                    t = timeit(lambda xx, tt: fused.tcq2_decode_matmul(
                        xx, tt, KV, m, k, a8=True, mode=mode, tune=tune),
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
            print(f"BEST {mode} KV={KV} {name}: {dict(tune)} "
                  f"{m * k / t / 1e3:.1f} Gw/s")


if __name__ == "__main__":
    main()
