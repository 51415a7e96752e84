"""Token-mixer family: MLP / GRU / LSTM / MHA mixers, blocks, stacks.

Behavioral re-design of the reference's mixer zoo
(/root/reference/mr_gen/model/utils/mixer_block.py, 1017 LoC of tuple-piped
nn.Sequential protocol). Structure kept (Mixer -> MixerBlock -> MixerLayerd
-> factory; mixer+FFN with residual/LN wraps at every level), state
threading re-designed:

  * states are explicit per-block lists passed in/out — no split_state
    consumption protocol (mixer_block.py:21-30).
  * recurrent stacks RETURN their fresh states. The reference's layerd
    wrappers accidentally return the consumed input list instead
    (mixer_block.py:754-759, 838-843), so its AR decoding never carries
    GRU/LSTM memory. We implement the evident intent; the AR engine has a
    reference-effective-behavior switch.
  * inference-time KV caching (mixer_block.py:591-601) becomes a
    fixed-shape ring buffer (see infer/cache.py) usable inside lax.scan.
    The reference's ``[-max_context_len:]`` truncation slices the *batch*
    dim (a no-op); the ring buffer implements the documented intent of a
    per-modality context budget (lstmformer.py:102-110).

Training-mode forward (cache=None) matches the reference's training path
exactly: full-sequence attention under the supplied mask.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalreactiongeneration_tpu.infer.cache import KVCache, cache_extend
from multimodalreactiongeneration_tpu.nn.attention import TorchMHA
from multimodalreactiongeneration_tpu.nn.basic import (
    LN_EPS,
    FeedForward,
    set_nonlinearity,
)
from multimodalreactiongeneration_tpu.nn.recurrent import TorchGRU, TorchLSTM


def _residual_wrap(y, x, use_residual, use_norm, norm):
    if not use_residual:
        return y
    y = y + x
    if use_norm:
        y = norm(y)
    return y


class MLPMixerBlock(nn.Module):
    """MLP mixer + FFN (reference mixer_block.py:114-166, 308-352)."""

    hidden_size: int
    num_layer: int = 1
    nonlinearity: Optional[str] = None
    residual: bool = False
    residual_layer_norm: bool = False
    bottleneck_size: Optional[int] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        act = set_nonlinearity(self.nonlinearity)
        y = x
        y = nn.Dense(self.hidden_size, use_bias=self.use_bias, name="input")(y)
        if act is not None:
            y = act(y)
        for i in range(1, self.num_layer):
            y = nn.Dense(
                self.hidden_size, use_bias=self.use_bias, name=f"hidden_{i}"
            )(y)
            if act is not None:
                y = act(y)
        y = nn.Dense(self.hidden_size, use_bias=self.use_bias, name="output")(y)
        y = _residual_wrap(
            y, x, self.residual, self.residual_layer_norm,
            nn.LayerNorm(epsilon=LN_EPS, name="mixer_norm"),
        )
        y = FeedForward(
            hidden_size=self.hidden_size,
            bottleneck_size=self.bottleneck_size,
            nonlinearity=self.nonlinearity,
            residual=self.residual,
            residual_layer_norm=self.residual_layer_norm,
            use_bias=self.use_bias,
            name="feed_forward",
        )(y)
        return y


class RecurrentMixerBlock(nn.Module):
    """GRU/LSTM mixer + FFN (reference mixer_block.py:355-507).

    ``kind`` in {"gru", "lstm"}. Bidirectional halves the hidden size so
    the concat matches hidden_size (mixer_block.py:185-190, 228-233).
    """

    hidden_size: int
    kind: str = "lstm"
    num_layers: int = 1
    dropout: float = 0.0
    bidirectional: bool = False
    nonlinearity: Optional[str] = None
    residual: bool = False
    residual_layer_norm: bool = False
    bottleneck_size: Optional[int] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, hx=None, *, deterministic: bool = True):
        hidden = self.hidden_size
        if self.bidirectional:
            if hidden % 2:
                raise ValueError("hidden_size must be even when bidirectional")
            hidden //= 2
        if self.kind == "lstm":
            rnn = TorchLSTM(
                input_size=self.hidden_size,
                hidden_size=hidden,
                num_layers=self.num_layers,
                dropout=self.dropout,
                bidirectional=self.bidirectional,
                name="mixer",
            )
        elif self.kind == "gru":
            rnn = TorchGRU(
                input_size=self.hidden_size,
                hidden_size=hidden,
                num_layers=self.num_layers,
                dropout=self.dropout,
                bidirectional=self.bidirectional,
                name="mixer",
            )
        else:
            raise ValueError(f"kind must be gru/lstm, got {self.kind!r}")
        y, new_hx = rnn(x, hx, deterministic=deterministic)
        y = _residual_wrap(
            y, x, self.residual, self.residual_layer_norm,
            nn.LayerNorm(epsilon=LN_EPS, name="mixer_norm"),
        )
        y = FeedForward(
            hidden_size=self.hidden_size,
            bottleneck_size=self.bottleneck_size,
            nonlinearity=self.nonlinearity,
            residual=self.residual,
            residual_layer_norm=self.residual_layer_norm,
            use_bias=self.use_bias,
            name="feed_forward",
        )(y)
        return y, new_hx


class MHAMixerBlock(nn.Module):
    """MHA mixer (N inner layers) + FFN (reference mixer_block.py:510-603).

    cache=None  -> full-sequence attention under attn_mask (training path).
    cache given -> decode path: a LIST of one ring buffer per inner MHA
                   layer holding POST-projection K/V; per step only the
                   incoming chunk is projected (the reference's concat
                   design reprojects the whole history every step).
    shared_raw  -> shared-KV decode path: (x_full, mask) of a RAW
                   (pre-projection) token stream kept ONCE for all
                   blocks/layers (infer/cache.py raw_cache_*); each inner
                   MHA folds its own K/V projections via attend_raw.
    """

    hidden_size: int
    num_layers: int = 1
    num_heads: int = 1
    dropout: float = 0.0
    kdim: Optional[int] = None
    vdim: Optional[int] = None
    nonlinearity: Optional[str] = None
    residual: bool = False
    residual_layer_norm: bool = False
    bottleneck_size: Optional[int] = None
    use_bias: bool = True
    rect_pad_masks: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        attn_mask=None,  # bool mask (True = masked)
        cache: Optional[List[KVCache]] = None,
        shared_raw: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[List[KVCache]]]:
        act = set_nonlinearity(self.nonlinearity)
        new_cache: Optional[List[KVCache]] = None if cache is None else []

        y = query
        for i in range(self.num_layers):
            mha = TorchMHA(
                embed_dim=self.hidden_size,
                num_heads=self.num_heads,
                dropout=self.dropout,
                kdim=self.kdim,
                vdim=self.vdim,
                use_bias=self.use_bias,
                rect_pad_masks=self.rect_pad_masks,
                name=f"mha_{i}",
            )
            if shared_raw is not None:
                x_full, smask = shared_raw
                y_att = mha.attend_raw(
                    y, x_full, smask, deterministic=deterministic
                )
            elif cache is None:
                y_att = mha(y, key, value, attn_mask,
                            deterministic=deterministic)
            else:
                # project only the incoming chunk; the ring buffer holds
                # projected K/V. attn_mask (if any) covers only the chunk;
                # cache_extend scatters it onto the written slots (priming).
                k_new, v_new = mha.project_kv(key, value)
                c_i, k_full, v_full, mask = cache_extend(
                    cache[i], k_new, v_new, chunk_mask=attn_mask
                )
                new_cache.append(c_i)
                y_att = mha.attend(y, k_full, v_full, mask,
                                   deterministic=deterministic)
            if act is not None:
                y_att = act(y_att)
            y = y_att
        y = _residual_wrap(
            y, query, self.residual, self.residual_layer_norm,
            nn.LayerNorm(epsilon=LN_EPS, name="mixer_norm"),
        )
        y = FeedForward(
            hidden_size=self.hidden_size,
            bottleneck_size=self.bottleneck_size,
            nonlinearity=self.nonlinearity,
            residual=self.residual,
            residual_layer_norm=self.residual_layer_norm,
            use_bias=self.use_bias,
            name="feed_forward",
        )(y)
        return y, new_cache


# ---------------------------------------------------------------------------
# Layered stacks (reference mixer_block.py:606-963)
# ---------------------------------------------------------------------------


class MLPMixerLayerd(nn.Module):
    hidden_size: int
    num_layerd: int = 1
    num_internal_layer: int = 1
    input_projection_size: Optional[int] = None
    output_projection_size: Optional[int] = None
    nonlinearity: Optional[str] = None
    residual: bool = False
    residual_layer_norm: bool = False
    bottleneck_size: Optional[int] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, hx=None, *, deterministic: bool = True):
        if self.input_projection_size is not None:
            x = nn.Dense(self.hidden_size, name="input_projection")(x)
        for i in range(self.num_layerd):
            x = MLPMixerBlock(
                hidden_size=self.hidden_size,
                num_layer=self.num_internal_layer,
                nonlinearity=self.nonlinearity,
                residual=self.residual,
                residual_layer_norm=self.residual_layer_norm,
                bottleneck_size=self.bottleneck_size,
                use_bias=self.use_bias,
                name=f"block_{i}",
            )(x, deterministic=deterministic)
        if self.output_projection_size is not None:
            x = nn.Dense(self.output_projection_size, name="output_projection")(x)
        return x, None


class RecurrentMixerLayerd(nn.Module):
    hidden_size: int
    kind: str = "lstm"
    num_layerd: int = 1
    num_internal_layer: int = 1
    dropout: float = 0.0
    bidirectional: bool = False
    input_projection_size: Optional[int] = None
    output_projection_size: Optional[int] = None
    nonlinearity: Optional[str] = None
    residual: bool = False
    residual_layer_norm: bool = False
    bottleneck_size: Optional[int] = None
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x,
        hx: Optional[List[Any]] = None,
        *,
        deterministic: bool = True,
    ):
        if self.input_projection_size is not None:
            x = nn.Dense(self.hidden_size, name="input_projection")(x)
        fused = self._fused_stack(x, hx, deterministic)
        if fused is not None:
            return fused
        new_states = []
        for i in range(self.num_layerd):
            block_hx = None if hx is None else hx[i]
            x, bhx = RecurrentMixerBlock(
                hidden_size=self.hidden_size,
                kind=self.kind,
                num_layers=self.num_internal_layer,
                dropout=self.dropout,
                bidirectional=self.bidirectional,
                nonlinearity=self.nonlinearity,
                residual=self.residual,
                residual_layer_norm=self.residual_layer_norm,
                bottleneck_size=self.bottleneck_size,
                use_bias=self.use_bias,
                name=f"block_{i}",
            )(x, block_hx, deterministic=deterministic)
            new_states.append(bhx)
        if self.output_projection_size is not None:
            x = nn.Dense(self.output_projection_size, name="output_projection")(x)
        return x, new_states

    def _fused_stack(self, x, hx, deterministic):
        """Run the whole block stack as ONE chunk-lag wavefront kernel
        (ops/pallas_mixer_stack.py); returns None to fall back.

        DEFAULT ON since round 5 (MRGEN_FUSED_ENCODER=0 reverts): the
        round-3 version won the forward 1.9x but LOST training (43 vs
        32 ms — its backward re-derived every parameter grad with a
        full-sequence recompute + einsums outside the kernel). The
        round-5 backward rewrite (wide-form derivative chain over
        stored A/M residuals, all nine parameter grads accumulated
        in-kernel per chunk, dx0 the only trajectory output) flips it:
        B32 x T240 bf16 metaformer train step 48.7 ms unfused ->
        42.9 ms fused (on-chip, 2026-08-21). Measured numbers and the
        schedule design live in the kernel module docstring.

        Params are declared through the low-level scope API at the
        EXACT paths the unfused submodules would create
        (block_i/mixer/..., block_i/mixer_norm, block_i/feed_forward/
        feedforward, block_i/feed_forward/LayerNorm_0) with the same
        initializers, so checkpoints, torch import/export maps and
        same-seed inits are path- and value-identical on both paths.
        """
        import math
        import os

        from multimodalreactiongeneration_tpu.nn.recurrent import (
            _uniform_init,
            resolve_impl,
        )

        if os.environ.get("MRGEN_FUSED_ENCODER", "1") == "0":
            return None
        if not (
            self.kind == "lstm"
            and self.num_internal_layer == 1
            and not self.bidirectional
            and self.num_layerd > 1
            and self.residual
            and self.residual_layer_norm
            and set_nonlinearity(self.nonlinearity) is None
            and self.use_bias
            and (self.dropout == 0 or deterministic)
            and x.shape[-1] == self.hidden_size
            and resolve_impl("auto", x.shape[1]) == "pallas"
        ):
            return None
        from multimodalreactiongeneration_tpu.ops.pallas_mixer_stack import (
            mixer_stack_recurrence,
        )

        h = self.hidden_size
        bound = 1.0 / math.sqrt(h)
        lstm_init = _uniform_init(bound)
        ones = nn.initializers.ones_init()
        zeros = nn.initializers.zeros_init()
        lecun = nn.initializers.lecun_normal()
        w_ih, b_g, w_hh, w_ff, b_ff, g1, b1, g2, b2 = (
            [], [], [], [], [], [], [], [], []
        )
        for i in range(self.num_layerd):
            blk = self.scope.push(f"block_{i}")
            mixer = blk.push("mixer")
            w_ih.append(mixer.param("weight_ih_l0", lstm_init, (4 * h, h)).T)
            w_hh.append(mixer.param("weight_hh_l0", lstm_init, (4 * h, h)).T)
            b_g.append(
                mixer.param("bias_ih_l0", lstm_init, (4 * h,))
                + mixer.param("bias_hh_l0", lstm_init, (4 * h,))
            )
            norm1 = blk.push("mixer_norm")
            g1.append(norm1.param("scale", ones, (h,)))
            b1.append(norm1.param("bias", zeros, (h,)))
            ff = blk.push("feed_forward")
            dense = ff.push("feedforward")
            w_ff.append(dense.param("kernel", lecun, (h, h)))
            b_ff.append(dense.param("bias", zeros, (h,)))
            norm2 = ff.push("LayerNorm_0")
            g2.append(norm2.param("scale", ones, (h,)))
            b2.append(norm2.param("bias", zeros, (h,)))

        st = lambda xs: jnp.stack(xs)
        mm = (
            jnp.bfloat16
            if w_hh[0].dtype == jnp.bfloat16
            else jnp.float32
        )
        f32 = jnp.float32
        num_layers = self.num_layerd
        if hx is None:
            h0 = jnp.zeros((num_layers, x.shape[0], h), f32)
            c0 = h0
        else:
            h0 = jnp.concatenate([p[0] for p in hx], axis=0).astype(f32)
            c0 = jnp.concatenate([p[1] for p in hx], axis=0).astype(f32)
        y, (hn, cn) = mixer_stack_recurrence(
            x.astype(f32),
            st(w_ih).astype(mm),
            st(b_g).astype(f32),
            st(w_hh).astype(mm),
            st(w_ff).astype(mm),
            st(b_ff).astype(f32),
            st(g1).astype(f32),
            st(b1).astype(f32),
            st(g2).astype(f32),
            st(b2).astype(f32),
            h0,
            c0,
        )
        y = y.astype(x.dtype)
        new_states = [
            (hn[l][None].astype(x.dtype), cn[l][None].astype(x.dtype))
            for l in range(num_layers)
        ]
        if self.output_projection_size is not None:
            y = nn.Dense(self.output_projection_size, name="output_projection")(y)
        return y, new_states


class MHAMixerLayerd(nn.Module):
    """Self- or cross-attention stack (reference mixer_block.py:846-963)."""

    hidden_size: int
    self_attention: bool = False
    num_layerd: int = 1
    num_internal_layer: int = 1
    num_heads: int = 1
    dropout: float = 0.0
    kdim: Optional[int] = None
    vdim: Optional[int] = None
    input_projection_size: Optional[int] = None
    output_projection_size: Optional[int] = None
    nonlinearity: Optional[str] = None
    residual: bool = False
    residual_layer_norm: bool = False
    bottleneck_size: Optional[int] = None
    use_bias: bool = True
    rect_pad_masks: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key: Optional[jnp.ndarray] = None,
        value: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        caches: Optional[List[Optional[KVCache]]] = None,
        shared_raw: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        *,
        deterministic: bool = True,
    ):
        query = x
        if self.input_projection_size is not None:
            query = nn.Dense(self.hidden_size, name="input_projection")(query)
        if self.self_attention:
            if shared_raw is not None:
                raise ValueError(
                    "shared_raw is a cross-attention decode path; "
                    "self-attention stacks re-key per block"
                )
            key, value = query, query
        if shared_raw is None and (key is None or value is None):
            raise ValueError("key/value required when self_attention is False")

        new_caches = []
        for i in range(self.num_layerd):
            if self.self_attention and i > 0:
                # each stacked block self-attends to ITS OWN input, like
                # the reference's per-block q=k=v (mixer_block.py MHAMixer
                # forward) — not to the stack's original input
                key = value = query
            cache = None if caches is None else caches[i]
            query, new_cache = MHAMixerBlock(
                hidden_size=self.hidden_size,
                num_layers=self.num_internal_layer,
                num_heads=self.num_heads,
                dropout=self.dropout,
                kdim=self.kdim,
                vdim=self.vdim,
                nonlinearity=self.nonlinearity,
                residual=self.residual,
                residual_layer_norm=self.residual_layer_norm,
                bottleneck_size=self.bottleneck_size,
                use_bias=self.use_bias,
                rect_pad_masks=self.rect_pad_masks,
                name=f"block_{i}",
            )(query, key, value, attn_mask, cache, shared_raw,
              deterministic=deterministic)
            new_caches.append(new_cache)
        if self.output_projection_size is not None:
            query = nn.Dense(self.output_projection_size, name="output_projection")(
                query
            )
        return query, new_caches


def build_mixer_layerd(mixer_type: str, configs: Dict[str, Any], name=None):
    """MixerLayerdFactory equivalent (reference mixer_block.py:993-1017).

    ``configs`` uses this framework's kwargs; models translate reference
    YAML fields (train harness does the mapping once, models/*.py).
    """
    if mixer_type == "mlp":
        return MLPMixerLayerd(**configs, name=name)
    if mixer_type in ("gru", "lstm"):
        return RecurrentMixerLayerd(kind=mixer_type, **configs, name=name)
    if mixer_type == "mha":
        return MHAMixerLayerd(**configs, name=name)
    raise ValueError(f"mixer_type must be mlp/gru/lstm/mha, got {mixer_type!r}")
