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
    import torch
    import torch.nn as nn

    class _LightningModule(nn.Module):
        """Just the surface the reference model code touches."""

        @property
        def device(self):
            return torch.device("cpu")

        current_epoch = 0

        def log(self, *a, **kw):
            pass

        def log_dict(self, *a, **kw):
            pass

    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = _LightningModule
    sys.modules.setdefault("pytorch_lightning", pl)
    util = types.ModuleType("pytorch_lightning.utilities")
    util_types = types.ModuleType("pytorch_lightning.utilities.types")
    util_types.STEP_OUTPUT = object
    util_types.EVAL_DATALOADERS = object
    util_types.TRAIN_DATALOADERS = object
    util.types = util_types
    sys.modules.setdefault("pytorch_lightning.utilities", util)
    sys.modules.setdefault("pytorch_lightning.utilities.types", util_types)
    # torchmetrics is only touched at construction time by the reference's
    # metric collections; inert stand-ins keep __init__ happy
    tm = types.ModuleType("torchmetrics")

    class _Metric:
        def __init__(self, *a, **kw):
            pass

        def clone(self, *a, **kw):
            return self

        def __call__(self, *a, **kw):
            return None

    tm.Metric = _Metric
    tm.MeanSquaredError = type("MeanSquaredError", (_Metric,), {})
    tm.MetricCollection = _Metric
    sys.modules.setdefault("torchmetrics", tm)
    om = types.ModuleType("omegaconf")
    om.DictConfig = dict  # used as a type annotation only
    sys.modules.setdefault("omegaconf", om)
    # bypass mr_gen/__init__.py: it eagerly imports the visualization stack
    # (mediapipe/cv2/moviepy, not installed here); the model subpackage is
    # torch-only and is all this benchmark needs
    pkg = types.ModuleType("mr_gen")
    pkg.__path__ = [os.path.join(REFERENCE, "mr_gen")]
    sys.modules.setdefault("mr_gen", pkg)
    utils_pkg = types.ModuleType("mr_gen.utils")
    utils_pkg.__path__ = [os.path.join(REFERENCE, "mr_gen", "utils")]
    sys.modules.setdefault("mr_gen.utils", utils_pkg)
    # ...and lstm_with_sampling/__init__.py, which pulls its trainer ->
    # databuild -> torchaudio chain; only the model module is needed
    lws_pkg = types.ModuleType("mr_gen.model.lstm_with_sampling")
    lws_pkg.__path__ = [
        os.path.join(REFERENCE, "mr_gen", "model", "lstm_with_sampling")
    ]
    sys.modules.setdefault("mr_gen.model.lstm_with_sampling", lws_pkg)
    # the model module only needs the dataloader's PADDING_VALUE constant;
    # the real dataloader pulls mr_gen.databuild -> torchaudio (absent)
    lws_dl = types.ModuleType("mr_gen.model.lstm_with_sampling.dataloader")
    lws_dl.PADDING_VALUE = -100  # dataloader.py:17
    sys.modules.setdefault(
        "mr_gen.model.lstm_with_sampling.dataloader", lws_dl
    )
    # same story for the lstmformer dataloader (lstmformer.py:11 imports
    # only its PADDING_VALUE constant, dataloader.py:16-17)
    lf_dl = types.ModuleType("mr_gen.model.lstmformer.dataloader")
    lf_dl.PADDING_VALUE = -100
    sys.modules.setdefault("mr_gen.model.lstmformer.dataloader", lf_dl)


class AttrDict(dict):
    """omegaconf-DictConfig-enough config object."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:  # getattr/hasattr protocol expects AttributeError
            raise AttributeError(name) from None


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


def build_reference_lws():
    """mr_gen LSTMwithSample at its production config
    (lstm_with_sampling/config.yaml: hidden 256, bottleneck 64, sampler
    128x2, layerd 2x1)."""
    sys.path.insert(0, REFERENCE)
    _install_lightning_stub()
    from mr_gen.model.lstm_with_sampling.lstm_with_sample import (
        LSTMwithSample,
    )

    model_cfg = AttrDict(
        max_epochs=60,
        use_scheduled_sampling=False,
        loss_type="huber",
        loss_reduction="mean",
        pred_fps=12.5,
        sampling_rate=16000,
        shift=160,
        use_centroid=True,
        use_angle=True,
        delta_order=2,
        nmels=26,
        sampler_hidden_size=128,
        sampler_num_layers=2,
        sampler_dropout_rate=0.0,
        hidden_size=256,
        bottleneck_size=64,
        num_layers=2,
        num_lstm=1,
        dropout_rate=0.0,
        use_layer_norm=True,
        use_relu=True,
        use_mixing=False,
        use_residual=True,
    )
    metrics_cfg = AttrDict(
        use_centroid=True, use_angle=True, delta_order=2
    )
    model = LSTMwithSample(model_cfg, AttrDict(), metrics_cfg)
    model.eval()
    return model


def run_metaformer(args):
    import torch

    model = build_reference_metaformer(
        hidden=args.hidden, num_block=args.blocks, heads=4, bottleneck=64,
        num_layerd=1, encoder_num_layer=args.blocks, num_internal_layer=1,
        max_context_len_s=10,
    )
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
    return best, f"metaformer-{args.hidden}x{args.blocks}"


def run_metaformer_train(args):
    """Full reference TRAIN step (fwd + huber loss + bwd + AdamW) at the
    train_bench workload (B x T full-sequence forward, lstmformer.py
    training_step semantics with no padding), timed per step."""
    import torch

    model = build_reference_metaformer(
        hidden=args.hidden, num_block=args.blocks, heads=4, bottleneck=64,
        num_layerd=1, encoder_num_layer=args.blocks, num_internal_layer=1,
        max_context_len_s=10,
    )
    model.train()
    from mr_gen.model.utils.multi_modal_metaformer import gen_attention_mask

    torch.manual_seed(0)
    RATIO, PADDING_VALUE = 8, 1e9
    B, T = args.batch, args.frames
    fbank = torch.randn(B, T * RATIO, 81)
    motion_p = torch.randn(B, T, 18)
    motion_s = torch.randn(B, T, 18)
    target = torch.randn(B, T, 18)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=1e-2)

    mm = gen_attention_mask(motion_s, motion_p, 4, PADDING_VALUE).view(
        -1, T, T
    )
    ma = gen_attention_mask(motion_s, fbank, 4, PADDING_VALUE).view(
        -1, T, fbank.shape[1]
    )
    others = (None, None, None)

    def step():
        opt.zero_grad()
        y, _, _ = model(
            motion_s, [fbank, motion_p], None, others,
            [others, others], [ma, mm],
        )
        loss = torch.nn.functional.huber_loss(y, target)
        loss.backward()
        opt.step()
        return float(loss.detach())

    step()  # warm caches/allocator
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        step()
        best = min(best, time.perf_counter() - t0)
    return best, f"metaformer-{args.hidden}x{args.blocks}"


def run_lws(args):
    import torch

    model = build_reference_lws()
    torch.manual_seed(0)
    RATIO = 8
    B, T, L = args.batch, args.frames, args.lead
    lens = torch.full((B,), T, dtype=torch.long)
    batch = [
        (torch.randn(B, T * RATIO, 81), lens),
        (torch.randn(B, T, 18), lens),
        (torch.randn(B, T, 18), lens),
        (torch.randn(B, L * RATIO, 81), lens),
        (torch.randn(B, L, 18), lens),
        (torch.randn(B, L, 18), lens),
        (torch.randn(B, T, 18), lens),
    ]
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        with torch.no_grad():
            model.prediction(batch, full_generation=True)
        best = min(best, time.perf_counter() - t0)
    return best, "lstm_with_sampling-256"


def build_reference_simple_lstm():
    """mr_gen SimpleLSTM at its production config (simple_lstm/config.yaml:
    hidden 256, lstm 128, att 8x3, decoder 5)."""
    sys.path.insert(0, REFERENCE)
    _install_lightning_stub()
    from mr_gen.model.simple_lstm.simple_lstm import SimpleLSTM

    cfg = AttrDict(
        acostic_feat_size=81, motion_feat_size=18,
        motion_num_lstm=1, acostic_num_lstm=1,
        acostic_num_layers=2, motion_num_layers=2,
        acostic_lstm_size=128, motion_lstm_size=128,
        acostic_lstm_out_size=256, motion_lstm_out_size=256,
        acostic_affine_size=256, motion_affine_size=256,
        acostic_bottleneck_size=64, motion_bottleneck_size=64,
        acostic_output_size=256, motion_output_size=256,
        att_heads=8, att_num_layers=3,
        att_use_residual=True, att_use_layer_norm=True,
        dropout_rate=0.0, output_size=18, bidirectional=True,
        use_layer_norm=True, use_relu=True, use_mixing=True,
        use_residual=True,
        decoder_num_layers=5, decoder_num_lstm=1, decoder_lstm_size=128,
        decoder_affine_size=256, decoder_bottleneck_size=64,
        decoder_output_size=256, decoder_mapping_size=64,
        decoder_bidirectional=True, decoder_use_layer_norm=True,
        decoder_use_relu=True, decoder_use_mixing=True,
        decoder_use_residual=True,
        delta_loss_scale=1, all_static=True,
    )
    metrics_cfg = AttrDict(use_centroid=True, use_angle=True, delta_order=2)
    model = SimpleLSTM(cfg, AttrDict(), metrics_cfg)
    model.eval()
    return model


def run_simple_lstm(args):
    """model_visualize execution: per generated frame, one forward over
    the sliding (acoustic window, motion context) pair
    (model_visualize sliding loop; context_size 15 @ stride 2,
    config.yaml:143-150 -> audio span 120 fbank frames).

    SimpleLSTM.forward cannot execute as written (it pipes the encoders'
    (tensor, state) tuples straight into nn.MultiheadAttention —
    PARITY.md #7), so this drives the same modules with the minimal
    intent fix: take the tensor half of each encoder output.
    """
    import torch

    model = build_reference_simple_lstm()

    def forward(acoustic, motion):
        a, _ = model.acoustic_encoder.acostic_lstm(
            model.acoustic_encoder.embed_layer(acoustic)
        )
        m, _ = model.motion_encoder.motion_lstm(
            model.motion_encoder.embed_layer(motion)
        )
        att = model.multimodal_att(m, a)
        y, _ = model.motion_decoder.decoder_lstm(att)
        return model.motion_decoder.mapping(y[:, -1:, :])

    torch.manual_seed(0)
    B, T = args.batch, args.frames
    ctx, a_win = 15, 120
    acoustic = torch.randn(B, a_win, 81)
    motion = torch.randn(B, ctx, 18)
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        with torch.no_grad():
            for _step in range(T):
                y = forward(acoustic, motion)
                motion = torch.cat([motion[:, 1:], y], dim=1)
        best = min(best, time.perf_counter() - t0)
    return best, "simple_lstm-256"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["metaformer", "lws", "simple_lstm"],
                    default="metaformer")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=250)
    ap.add_argument("--lead", type=int, default=12)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--train", action="store_true",
                    help="time the reference TRAIN step (fwd+bwd+AdamW, "
                         "metaformer only) instead of AR decode")
    args = ap.parse_args()

    import torch

    if args.train:
        if args.model != "metaformer":
            ap.error("--train supports the metaformer only")
        best, name = run_metaformer_train(args)
        print(json.dumps({
            "metric": "reference_cpu_torch_train_step_seconds",
            "value": round(best, 3),
            "unit": f"s/step (B{args.batch} x T{args.frames}, {name}, "
                    "fwd+bwd+AdamW, reference code on CPU)",
            "torch": torch.__version__,
            "cpus": os.cpu_count(),
            "threads": torch.get_num_threads(),
        }))
        return
    runner = {
        "metaformer": run_metaformer,
        "lws": run_lws,
        "simple_lstm": run_simple_lstm,
    }[args.model]
    best, name = runner(args)
    B, T = args.batch, args.frames
    fps = B * T / best
    print(json.dumps({
        "metric": "reference_cpu_torch_ar_decode_frames_per_sec",
        "value": round(fps, 2),
        "unit": f"frames/s (batch {B} x {T} frames, {name}, "
                "reference code on CPU)",
        "torch": torch.__version__,
        "cpus": os.cpu_count(),
        "threads": torch.get_num_threads(),
        "seconds_per_generation": round(best, 3),
    }))


if __name__ == "__main__":
    main()
