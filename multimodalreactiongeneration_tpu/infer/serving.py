"""Multi-session serving engine: continuous batching for live reaction
generation.

The reference has no serving story at all — its closest analog is the
per-sample eval loop (visualize_metaformer.py:88-149, one dialog at a
time). This engine serves MANY concurrent dialogs on one chip: a fixed
pool of N slots, each an independent 12.5 fps generation session
(StreamingSession semantics), all advanced by ONE jitted step per frame
interval.

Design (TPU-native):
  * The per-slot step (incremental fbank -> metaformer decode with KV
    ring buffers -> next pose frame) is written batch-1 and lifted over
    the slot axis with ``jax.vmap``. vmap gives every state leaf —
    KV ring buffers (1, C, D), torch-layout LSTM states (L, 1, H), ring
    positions () — a uniform leading slot axis, so attaching a session
    is ONE uniform scatter ``pooled.at[slot].set(fresh)`` per leaf, with
    no per-leaf batch-axis bookkeeping.
  * Per-slot ring positions come free: each slot's cache "length" is its
    own scalar under vmap, so sessions attached at different times stay
    correctly aligned to their own histories (a shared-batch decode like
    infer/generate.py requires all rows to start together).
  * Slots hold their place in the compiled program whether or not a
    session is attached: the step shape is static, XLA compiles once,
    and attach/detach never retraces. Detached slots compute garbage
    that is masked on the host — the standard fixed-capacity
    continuous-batching trade.

Attach primes the slot on a leading segment (feature space), exactly
the reference's warmup (lstm_with_sample.py:374-377); the AR seed is
the last lead self-motion frame.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from multimodalreactiongeneration_tpu.infer.generate import (
    _init_metaformer_states,
)
from multimodalreactiongeneration_tpu.infer.streaming import (
    fbank_stream_geometry,
)
from multimodalreactiongeneration_tpu.ops import dsp


class ServingEngine:
    """Fixed-capacity multi-session decode server for the Metaformer.

    slots: compiled batch capacity (sessions served concurrently).
    """

    def __init__(self, model, params, slots: int = 8, mesh=None,
                 cache_dtype=None, kv_layout: str = None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis. The slot
        pool (states, prev frames, per-step inputs) is sharded over it
        and params replicated, so one engine serves slots across every
        chip of a slice — the serving analog of the data-parallel train
        step (parallel/mesh.py). slots must divide evenly."""
        if slots < 1:
            raise ValueError(f"need at least 1 slot, got {slots}")
        self.model = model
        self.params = params
        self.cfg = model.cfg
        self.slots = slots
        self.mesh = mesh
        # KV ring-buffer dtype for every slot's caches: bf16 default
        # (generate_metaformer's inference default); int8 halves the
        # pooled VMEM again for higher slot counts (infer/cache.py)
        self.cache_dtype = (
            jnp.bfloat16 if cache_dtype is None else cache_dtype
        )
        # KV layout per slot: "shared" (one raw ring buffer per other
        # modality, projections folded — 10x smaller slot state at the
        # production size, see infer/generate.py) unless the config or
        # dtype requires the per-block layout
        if kv_layout is None:
            kv_layout = (
                "per_block"
                if self.cfg["repeat_with_encoder"]
                or self.cache_dtype == jnp.int8
                else "shared"
            )
        self.kv_layout = kv_layout
        self._slot_sharding = None
        if mesh is not None:
            from multimodalreactiongeneration_tpu.parallel.mesh import (
                batch_sharding,
                replicated,
            )

            n_dev = mesh.devices.size
            if slots % n_dev:
                raise ValueError(
                    f"{slots} slots do not divide over {n_dev} devices"
                )
            self._slot_sharding = batch_sharding(mesh)
            self.params = jax.device_put(params, replicated(mesh))
        fbp, self.ratio, self.hop_samples, self.context_samples = (
            fbank_stream_geometry(self.cfg)
        )
        self._fbp = fbp
        from multimodalreactiongeneration_tpu.models.lstmformer import (
            derived_sizes,
        )

        self.feat_dim = derived_sizes(self.cfg)["motion_input_size"]

        self.active = np.zeros(slots, bool)
        self._free: List[int] = list(range(slots))[::-1]
        self._tails = np.zeros((slots, self.context_samples), np.float32)

        # pooled state: every leaf of the batch-1 state pytree broadcast
        # to a leading slot axis (the structure states settle into after
        # one apply — lstm embedding states materialize from None then)
        proto = self._fresh_state(
            jnp.zeros((1, self.ratio, 81)),
            jnp.zeros((1, 1, self.feat_dim)),
            jnp.zeros((1, 1, self.feat_dim)),
        )
        self._states = jax.tree_util.tree_map(
            lambda leaf: self._place(
                jnp.broadcast_to(leaf, (slots,) + leaf.shape)
            ),
            proto,
        )
        self._prev = self._place(
            jnp.zeros((slots, 1, 1, self.feat_dim), jnp.float32)
        )

        def one_step(p, state, prev, audio_buf, mp_frame):
            """Single slot, model batch dim = 1 (vmap adds the slot axis).

            audio_buf (buf_samples,), mp_frame (1, feat) -> (1, feat)."""
            feat = dsp.logmel_with_power(audio_buf, fbp)[None]
            y, new_state = self.model.apply(
                p, feat, mp_frame[None], prev,
                states=state, use_masks=False,
            )
            return y, new_state

        # params as an argument (in_axes None), not a closure constant:
        # closed-over arrays would be baked into the executable
        self._step = jax.jit(
            jax.vmap(one_step, in_axes=(None, 0, 0, 0, 0))
        )

        def scatter(pooled, slot, fresh):
            return jax.tree_util.tree_map(
                lambda p, f: p.at[slot].set(f), pooled, fresh
            )

        self._scatter = jax.jit(scatter)

    def _place(self, x):
        """Shard a slot-axis array over the mesh (no-op without one)."""
        if self._slot_sharding is None:
            return x
        return jax.device_put(x, self._slot_sharding)

    def _fresh_state(self, lead_audio, lead_mp, lead_ms):
        """Prime a batch-1 state on a leading segment (reference warmup).

        Compiles once per distinct lead length; pad leads to a fixed
        length in production to keep attach latency constant."""
        if not hasattr(self, "_prime"):
            def prime(p, la, lmp, lms, st):
                _, st = self.model.apply(
                    p, la, lmp, lms, states=st, use_masks=True
                )
                return st

            self._prime = jax.jit(prime)
        st = _init_metaformer_states(
            self.cfg, 1, self.cache_dtype, self.kv_layout
        )
        return self._prime(
            self.params,
            jnp.asarray(lead_audio, jnp.float32),
            jnp.asarray(lead_mp, jnp.float32),
            jnp.asarray(lead_ms, jnp.float32),
            st,
        )

    def attach(
        self,
        lead_audio: np.ndarray,  # (1, L*ratio, 81) feature space
        lead_mp: np.ndarray,  # (1, L, feat)
        lead_ms: np.ndarray,  # (1, L, feat)
    ) -> int:
        """Start a session: prime a fresh state, scatter it into a free
        slot, seed the AR loop with the last lead self-motion frame.
        Returns the slot id. Raises when the pool is full."""
        if not self._free:
            raise RuntimeError(f"all {self.slots} slots are attached")
        slot = self._free.pop()
        fresh = self._fresh_state(lead_audio, lead_mp, lead_ms)
        self._states = self._scatter(self._states, slot, fresh)
        seed = jnp.asarray(lead_ms)[:, -1:].astype(jnp.float32)
        self._prev = self._prev.at[slot].set(seed)
        self._tails[slot] = 0.0
        self.active[slot] = True
        return slot

    def detach(self, slot: int) -> None:
        """End a session. The slot keeps its place in the compiled step
        (static shapes) and is reused by the next attach."""
        if not self.active[slot]:
            raise ValueError(f"slot {slot} is not attached")
        self.active[slot] = False
        self._free.append(slot)

    def step(
        self,
        audio_samples: np.ndarray,  # (slots, hop_samples) raw f32
        partner_motion: np.ndarray,  # (slots, 1, feat)
    ) -> np.ndarray:
        """Advance every session one frame; ONE device dispatch for the
        whole pool. Rows of detached slots are ignored (pass zeros) and
        come back as zeros. Returns (slots, 1, feat)."""
        if audio_samples.shape != (self.slots, self.hop_samples):
            raise ValueError(
                f"need audio ({self.slots}, {self.hop_samples}), "
                f"got {audio_samples.shape}"
            )
        if np.shape(partner_motion) != (self.slots, 1, self.feat_dim):
            raise ValueError(
                f"need partner_motion ({self.slots}, 1, {self.feat_dim}), "
                f"got {np.shape(partner_motion)}"
            )
        buf = np.concatenate([self._tails, audio_samples], axis=-1)
        self._tails = buf[:, -self.context_samples:]
        y, self._states = self._step(
            self.params,
            self._states,
            self._prev,
            self._place(jnp.asarray(buf)),
            self._place(jnp.asarray(partner_motion, jnp.float32)),
        )
        self._prev = y
        # np.array (not asarray): jax arrays view as read-only
        out = np.array(y)[:, 0]  # (slots, 1, feat)
        out[~self.active] = 0.0
        return out
