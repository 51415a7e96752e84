"""Measure the reference's CPU-PyTorch AR decode — the BASELINE.md denominator.

Runs the REFERENCE CODE ITSELF (imported from /root/reference, nothing
copied): builds mr_gen's MultiModalMetaformer at the production size used
by bench.py (hidden 256, 5 blocks, lstm embeddings; lstmformer/config.yaml)
and replicates the Metaformer.prediction() generation procedure exactly —
warmup forward over the leading segment, then one forward per motion frame
with hxs carried (lstmformer.py:425-521) — on the same workload bench.py
times on TPU (batch 8 x 250 frames @ 12.5 fps).

The only shim is a minimal `pytorch_lightning` stub (LightningModule =
nn.Module): the reference uses it purely as a base class in
residual_connection.py and it is not installed here.

Usage: python benchmarks/torch_baseline.py [--frames N] [--batch B]
Prints one JSON line with frames/s and environment details; the measured
number is recorded in BASELINE.md and used as bench.py's vs_baseline
denominator.
"""

import argparse
import json
import os
import sys
import time
import types

REFERENCE = "/root/reference"


def _install_lightning_stub():
    import torch.nn as nn

    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = nn.Module
    sys.modules.setdefault("pytorch_lightning", pl)
    # bypass mr_gen/__init__.py: it eagerly imports the visualization stack
    # (mediapipe/cv2/moviepy, not installed here); the model subpackage is
    # torch-only and is all this benchmark needs
    pkg = types.ModuleType("mr_gen")
    pkg.__path__ = [os.path.join(REFERENCE, "mr_gen")]
    sys.modules.setdefault("mr_gen", pkg)


def build_reference_metaformer(hidden, num_block, heads, bottleneck,
                               num_layerd, encoder_num_layer,
                               num_internal_layer, max_context_len_s):
    """Reference config plumbing (lstmformer.py:126-216), sizes inlined."""
    sys.path.insert(0, REFERENCE)
    _install_lightning_stub()
    import torch
    from mr_gen.model.utils.argparser import (
        feedforward_block_argments,
        mixer_layerd_argments_select,
    )
    from mr_gen.model.utils.multi_modal_metaformer import MultiModalMetaformer

    acoustic_fps, pred_fps = 100.0, 12.5
    context_len = [int(max_context_len_s * acoustic_fps),
                   int(max_context_len_s * pred_fps)]
    acoustic_input_size = (26 + 1) * 3  # (nmels+1)*(delta_order+1) = 81
    motion_input_size = 2 * 3 * 3  # (use_centroid+use_angle)*3*(delta+1) = 18

    common = dict(
        hidden_size=hidden,
        input_projection=False,
        output_projection=False,
        self_attention=True,
        num_heads=heads,
        dropout=0.0,
        batch_first=True,
        bidirectional=False,
        proj_size=0,
        add_bias_kv=False,
        add_zero_attn=False,
        kdim=hidden,
        vdim=hidden,
        max_context_len=125,
        num_layerd=num_layerd,
        num_internal_layer=num_internal_layer,
        nonlinearity="none",
        bottleneck_size=bottleneck,
        residual=True,
        residual_layer_norm=True,
        bias=True,
        device=torch.device("cpu"),
    )
    main_cfg = mixer_layerd_argments_select("lstm", **common)
    enc = dict(common, num_layerd=encoder_num_layer)
    other_cfgs = [mixer_layerd_argments_select("lstm", **enc)
                  for _ in range(2)]
    integ = dict(common, self_attention=False)
    integ_cfgs = [mixer_layerd_argments_select("mha", **integ)
                  for _ in range(2)]
    for i, cl in enumerate(context_len):
        integ_cfgs[i]["max_context_len"] = cl
    ff_cfg = feedforward_block_argments(
        hidden_size=hidden, bottleneck_size=bottleneck, nonlinearity="relu",
        residual=True, residual_layer_norm=True, bias=True,
        device=torch.device("cpu"),
    )
    out_ff_cfg = feedforward_block_argments(
        hidden_size=hidden, bottleneck_size=bottleneck,
        output_size=motion_input_size, nonlinearity="relu", residual=False,
        bias=True, device=torch.device("cpu"),
    )
    model = MultiModalMetaformer(
        modal_num=3,
        hidden_dim=hidden,
        num_layer=num_block,
        main_modal_feature_dim=motion_input_size,
        main_mixer_type="lstm",
        main_mixer_configs=main_cfg,
        integrate_mixer_configs=integ_cfgs,
        feedforward_configs=ff_cfg,
        output_feedforward_configs=out_ff_cfg,
        other_modal_feature_dim=[acoustic_input_size, motion_input_size],
        other_mixer_type=["lstm", "lstm"],
        other_mixer_configs=other_cfgs,
        repeat_with_encoder=False,
        interlayer_residual=False,
        interlayer_residual_norm=True,
    )
    model.eval()
    return model


def reference_forward(model, heads, fbank, motion_p, motion_s, hxs):
    """lstmformer.Metaformer.forward mask plumbing (lstmformer.py:235-311),
    zero-length leads as in generate_one_step (dummy_input)."""
    import torch
    from mr_gen.model.utils.multi_modal_metaformer import gen_attention_mask

    PADDING_VALUE = 1e9  # mr_gen.model.utils.values
    motion_len = motion_s.shape[1]
    mm = gen_attention_mask(motion_s, motion_p, heads, PADDING_VALUE).view(
        -1, motion_len, motion_len
    )
    ma = gen_attention_mask(motion_s, fbank, heads, PADDING_VALUE).view(
        -1, motion_len, fbank.shape[1]
    )
    main_others = (None, None, None)
    other_others = [(None, None, None), (None, None, None)]
    with torch.no_grad():
        y, _, hxs = model(
            motion_s, [fbank, motion_p], hxs, main_others, other_others,
            [ma, mm],
        )
    return y, hxs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=250)
    ap.add_argument("--lead", type=int, default=12)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    model = build_reference_metaformer(
        hidden=args.hidden, num_block=args.blocks, heads=4, bottleneck=64,
        num_layerd=1, encoder_num_layer=args.blocks, num_internal_layer=1,
        max_context_len_s=10,
    )
    import torch

    torch.manual_seed(0)
    RATIO = 8
    B, T, L = args.batch, args.frames, args.lead
    fbank = torch.randn(B, T * RATIO, 81)
    motion_p = torch.randn(B, T, 18)
    motion_s = torch.randn(B, T, 18)
    lead_a = torch.randn(B, L * RATIO, 81)
    lead_mp = torch.randn(B, L, 18)
    lead_ms = torch.randn(B, L, 18)

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        # warmup_model: full forward over the leading segment
        y, hxs = reference_forward(model, 4, lead_a, lead_mp, lead_ms, None)
        prev = motion_s[:, :1]
        # head_motion_generation: one forward per frame, state carried
        for step in range(T):
            fb = fbank[:, step * RATIO:(step + 1) * RATIO]
            mp = motion_p[:, step:step + 1]
            prev, hxs = reference_forward(model, 4, fb, mp, prev, hxs)
        best = min(best, time.perf_counter() - t0)

    fps = B * T / best
    print(json.dumps({
        "metric": "reference_cpu_torch_ar_decode_frames_per_sec",
        "value": round(fps, 2),
        "unit": f"frames/s (batch {B} x {T} frames, metaformer-"
                f"{args.hidden}x{args.blocks}, reference code on CPU)",
        "torch": torch.__version__,
        "cpus": os.cpu_count(),
        "threads": torch.get_num_threads(),
        "seconds_per_generation": round(best, 3),
    }))


if __name__ == "__main__":
    main()
