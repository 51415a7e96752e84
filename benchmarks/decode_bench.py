"""Reproducible TPU decode benchmarks for the non-flagship models.

bench.py covers the headline (Metaformer batched decode); this script
makes the other two BASELINE.md decode rows re-derivable at the same
production sizes their CPU-PyTorch denominators were measured at
(benchmarks/torch_baseline.py --model {lws,simple_lstm}):

  * lws: LSTMwithSample fused-scan AR decode, batch 8 x 250 frames
    (hidden 256, bottleneck 64, sampler 128x2, layerd 2x1 —
    configs/lstm_with_sampling.yaml).
  * simple_lstm: sliding-window generation, batch 1 x 250 frames,
    context 15 @ stride 2, 120-frame audio window
    (configs/simple_lstm.yaml production sizes).

Timing uses bench.time_decode (slope method; see the verify skill's TPU
timing rules). Prints one JSON line per run.

Usage: python benchmarks/decode_bench.py --model {lws,simple_lstm}
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

import bench  # noqa: E402

FRAMES = 250
RATIO = 8
LEAD = 12

LWS_CFG = dict(
    sampling_rate=16000,
    shift=160,
    pred_fps=12.5,
    use_centroid=True,
    use_angle=True,
    nmels=26,
    delta_order=2,
    sampler_hidden_size=128,
    sampler_num_layers=2,
    sampler_dropout_rate=0.0,
    hidden_size=256,
    bottleneck_size=64,
    num_layers=2,
    num_lstm=1,
    dropout_rate=0.0,
    use_layer_norm=True,
    use_mixing=False,
    use_residual=True,
    use_relu=True,
)

SIMPLE_CFG = dict(
    acostic_feat_size=81,
    motion_feat_size=18,
    motion_num_lstm=1,
    acostic_num_lstm=1,
    acostic_num_layers=2,
    motion_num_layers=2,
    acostic_lstm_size=128,
    motion_lstm_size=128,
    acostic_affine_size=256,
    motion_affine_size=256,
    acostic_output_size=256,
    motion_output_size=256,
    att_heads=8,
    att_num_layers=3,
    att_use_residual=True,
    att_use_layer_norm=True,
    dropout_rate=0.0,
    output_size=18,
    bidirectional=True,
    use_layer_norm=True,
    use_relu=True,
    use_mixing=True,
    use_residual=True,
    decoder_num_layers=5,
    decoder_num_lstm=1,
    decoder_lstm_size=128,
    decoder_affine_size=256,
    decoder_bottleneck_size=64,
    decoder_output_size=256,
    decoder_mapping_size=64,
    decoder_bidirectional=True,
    decoder_use_layer_norm=True,
    decoder_use_relu=True,
    decoder_use_mixing=True,
    decoder_use_residual=True,
)


def run_lws(batch: int):
    from multimodalreactiongeneration_tpu.infer.generate import (
        generate_lws,
        sampling_mask_for,
    )
    from multimodalreactiongeneration_tpu.models.lstm_with_sampling import (
        LSTMwithSample,
    )

    model = LSTMwithSample(cfg=LWS_CFG)
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    data = (
        jax.random.normal(ks[0], (batch, FRAMES * RATIO, 81)),
        jax.random.normal(ks[1], (batch, FRAMES, 18)),
        jax.random.normal(ks[2], (batch, FRAMES, 18)),
        jax.random.normal(ks[3], (batch, LEAD * RATIO, 81)),
        jax.random.normal(ks[4], (batch, LEAD, 18)),
        jax.random.normal(ks[5], (batch, LEAD, 18)),
        jax.random.normal(ks[6], (batch, FRAMES, 18)),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), *data[:3])
    mask = sampling_mask_for(FRAMES, "full")
    decode = jax.jit(lambda p, b: generate_lws(model, p, b, mask))
    # the full lws decode runs ~4 ms; at bench.py's default 2/8 iteration
    # counts the slope is dominated by tunnel jitter (measured spread
    # 290k-650k frames/s run-to-run) — longer chains stabilize it
    dt = bench.time_decode(decode, params, data, n_small=20, n_large=80,
                           estimates=5)
    return batch * FRAMES / dt, f"lws-256 (batch {batch} x {FRAMES} frames)"


def run_simple(batch: int):
    from multimodalreactiongeneration_tpu.infer.simple_generate import (
        sliding_window_generate,
    )
    from multimodalreactiongeneration_tpu.models.simple_lstm import SimpleLSTM

    assert batch == 1, "production simple_lstm generation is batch-1"
    model = SimpleLSTM(cfg=SIMPLE_CFG)
    ctx, a_win = 15, 120
    fb = jax.random.normal(jax.random.PRNGKey(0), (FRAMES, a_win, 81))
    c0 = jax.random.normal(jax.random.PRNGKey(1), (ctx, 18))
    params = jax.jit(model.init)(jax.random.PRNGKey(2), fb[:1], c0[None])
    # keep the output 3-D: time_decode perturbs via out[0, 0, 0]
    decode = jax.jit(
        lambda p, b: sliding_window_generate(model, p, b[0], b[1])[None]
    )
    dt = bench.time_decode(decode, params, (fb, c0))
    return FRAMES / dt, f"simple_lstm-256 (batch 1 x {FRAMES} frames)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["lws", "simple_lstm"], required=True)
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    if args.model == "lws":
        fps, unit = run_lws(args.batch or 8)
    else:
        fps, unit = run_simple(args.batch or 1)
    print(
        json.dumps(
            {
                "metric": f"{args.model}_decode_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": f"frames/s/chip ({unit})",
            }
        )
    )


if __name__ == "__main__":
    main()
