"""Continuous-batching decode engine.

The reference has no serving layer (single-prompt throughput script only);
this implements the north-star serving surface: a fixed pool of batch
slots, each with its own KV-cache position, admitting new requests as
slots free up.  The decode step is one jit over the whole slot pool with
per-slot positions (models/llama.py handles vector cache_pos), so
admission/completion never triggers recompilation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from qpalette_tpu.models import llama
from qpalette_tpu.runtime.decode import sample_logits


@functools.partial(jax.jit, static_argnames=("spec", "temperature", "top_k"))
def _pool_step(spec, params, tokens, caches, positions, active, key,
               temperature: float = 0.6, top_k: Optional[int] = 5):
    """tokens (B, 1); positions (B,); active (B,) bool."""
    logits, caches = llama.forward(spec, params, tokens, kv_caches=caches,
                                   cache_pos=positions)
    nxt = sample_logits(logits[:, -1], key, temperature, top_k)
    nxt = jnp.where(active, nxt, 0)
    return nxt[:, None], caches


@dataclass
class Request:
    rid: int
    prompt: List[int]
    max_new_tokens: int
    output: List[int] = field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    """Slot-pool scheduler: submit() requests, step() the pool, collect()."""

    def __init__(self, spec, params, n_slots: int = 4, max_seq: int = 512,
                 temperature: float = 0.6, top_k: Optional[int] = 5,
                 eos_id: Optional[int] = None, seed: int = 0):
        self.spec, self.params = spec, params
        self.n_slots, self.max_seq = n_slots, max_seq
        self.temperature, self.top_k = temperature, top_k
        self.eos_id = eos_id
        self.caches = llama.init_kv_caches(spec, n_slots, max_seq)
        self.positions = np.zeros((n_slots,), np.int32)
        self.cur = np.zeros((n_slots, 1), np.int32)
        self.slot_req: List[Optional[Request]] = [None] * n_slots
        self.queue: List[Request] = []
        self.finished: Dict[int, Request] = {}
        self.key = jax.random.PRNGKey(seed)
        self._next_rid = 0

    def submit(self, prompt: List[int], max_new_tokens: int = 64) -> int:
        rid = self._next_rid
        self._next_rid += 1
        self.queue.append(Request(rid, list(prompt), max_new_tokens))
        return rid

    def _admit(self):
        for slot in range(self.n_slots):
            if self.slot_req[slot] is None and self.queue:
                req = self.queue.pop(0)
                self.slot_req[slot] = req
                # prefill this slot: run its prompt through the pool step
                # one token at a time at the slot's positions (simple and
                # shape-stable; chunked prefill is a follow-up)
                self.positions[slot] = 0
                for t in req.prompt[:-1]:
                    self._single_slot_token(slot, t)
                self.cur[slot, 0] = req.prompt[-1]

    def _single_slot_token(self, slot: int, token: int):
        toks = self.cur.copy()
        toks[slot, 0] = token
        active = np.zeros((self.n_slots,), bool)
        active[slot] = True
        self.key, sk = jax.random.split(self.key)
        # NOTE: jnp.asarray on a host numpy buffer is zero-copy on CPU and
        # dispatch is async — always copy mutable host state at the device
        # boundary or later `self.positions[...] += 1` races the read.
        nxt, self.caches = _pool_step(
            self.spec, self.params, jnp.array(toks), self.caches,
            jnp.array(self.positions), jnp.array(active), sk,
            self.temperature, self.top_k)
        self.positions[slot] += 1

    def step(self):
        """One decode step across all active slots."""
        self._admit()
        active = np.array([r is not None for r in self.slot_req])
        if not active.any():
            return False
        self.key, sk = jax.random.split(self.key)
        nxt, self.caches = _pool_step(
            self.spec, self.params, jnp.array(self.cur), self.caches,
            jnp.array(self.positions), jnp.array(active), sk,
            self.temperature, self.top_k)
        nxt = np.asarray(nxt)
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            self.positions[slot] += 1
            tok = int(nxt[slot, 0])
            req.output.append(tok)
            self.cur[slot, 0] = tok
            full = self.positions[slot] + 1 >= self.max_seq
            if (len(req.output) >= req.max_new_tokens or full
                    or (self.eos_id is not None and tok == self.eos_id)):
                req.done = True
                self.finished[req.rid] = req
                self.slot_req[slot] = None
                self.positions[slot] = 0
        return True

    def run(self, max_steps: int = 10000):
        steps = 0
        while (any(r is not None for r in self.slot_req) or self.queue) \
                and steps < max_steps:
            self.step()
            steps += 1
        return self.finished
