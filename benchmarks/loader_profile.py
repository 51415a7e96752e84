"""Phase breakdown of the production streaming train loader.

epoch_bench.py showed steady-state e2e training at ~2k real frames/s
while the jitted step alone sustains >100k — the gap is host collate +
tunnel transfers. This profiler mirrors BatchLoader._collate
(data/dataset.py) phase by phase on the epoch_bench corpus so the gap
is attributable:

  manifest   raw_item: JSON parse + npz motion slicing (host)
  read       native batched wav read (host)
  fbank      batched device fbank call + np.array readback (device +
             tunnel down)   <- production does np.array(...)
  pad        motion padding copies (host)
  stage      Trainer._stage-equivalent device_put of the full batch
             (tunnel up), synced via a 1-element readback

Run (after `python benchmarks/epoch_bench.py` has built the corpus):
    python benchmarks/loader_profile.py [--batch 16] [--epochs 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=300.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=2,
                    help="profile epochs (first warms file caches)")
    ap.add_argument("--workdir", default="/tmp/mrgen_epoch_bench")
    ap.add_argument("--legacy", action="store_true",
                    help="profile the pre-round-3 collate (np.array "
                         "readback + host sentinel fill + re-upload)")
    args = ap.parse_args()

    corpus = os.path.join(
        args.workdir, f"corpus_{args.sessions}x{int(args.seconds)}"
    )
    run_dir = os.path.join(
        args.workdir, f"run_lstmformer_s{args.sessions}x{int(args.seconds)}"
    )
    if not (os.path.isdir(corpus) and os.path.isdir(run_dir)):
        sys.exit("run benchmarks/epoch_bench.py first (corpus/cache missing)")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(run_dir)

    import jax
    import numpy as np

    from multimodalreactiongeneration_tpu.data.databuild_nx import DataBuilderNX
    from multimodalreactiongeneration_tpu.data.dataset import (
        BatchLoader,
        SegmentDatasetNX,
        _round_up,
        random_split_indices,
    )
    from multimodalreactiongeneration_tpu.ops import dsp
    from multimodalreactiongeneration_tpu.utils import native_io
    from multimodalreactiongeneration_tpu.utils.config import load_config
    from multimodalreactiongeneration_tpu.utils.logging import set_logger

    cfg = load_config(
        os.path.join(repo, "configs/lstmformer.yaml"),
        [
            f"data_dir={corpus}", "name=loader_profile",
            f"batch_size={args.batch}", "exp.train_rate=0.8",
            "exp.valid_rate=0.1", f"log_dir={run_dir}/log",
            f"ckpt_path={run_dir}/ckpts",
        ],
    )
    logger = set_logger("loader_profile", cfg.log_dir)
    builder = DataBuilderNX(cfg.data, logger)
    dataset = SegmentDatasetNX(builder.data_site, cfg.motion, cfg.audio)
    tr, _, _ = random_split_indices(len(dataset), 0.8, 0.1, seed=0)
    loader = BatchLoader(
        dataset, tr, args.batch, shuffle=True, seed=0,
        audio_cfg=cfg.audio.to_dict(), bucket_windows=8,
    )

    audio_cfg = cfg.audio.to_dict()
    params = dsp.FbankParams(
        sample_rate=audio_cfg["sample_rate"], n_fft=audio_cfg["nfft"],
        hop=audio_cfg["shift"], n_mels=audio_cfg["nmels"],
        delta_order=audio_cfg["delta_order"],
    )
    pad_value = -100.0

    for epoch in range(args.epochs):
        t = dict.fromkeys(
            ["manifest", "read", "fbank", "pad", "stage"], 0.0
        )
        nbytes = {"wave_up": 0, "fbank_down": 0, "stage_up": 0}
        frames = 0
        t_epoch0 = time.perf_counter()
        for chunk in loader._epoch_batches():
            t0 = time.perf_counter()
            raws = [dataset.raw_item(int(j), audio="spec") for j in chunk]
            t["manifest"] += time.perf_counter() - t0

            tm = max(r["motion_s"].shape[0] for r in raws)
            tm = _round_up(tm, 16)
            lead_tm = max(r["lead_motion_p"].shape[0] for r in raws)
            frames += sum(r["motion_s"].shape[0] for r in raws)

            batch = []
            for key, budget in [("audio_seq", tm * 8), ("audio_lead", lead_tm * 8)]:
                specs = [r[key] for r in raws]
                needed = (budget + params.delta_order - 1) * params.hop + params.n_fft
                t0 = time.perf_counter()
                wave = native_io.read_batch(
                    [s[0] for s in specs], [s[1] for s in specs], needed,
                    dtype=np.float32 if args.legacy else np.int16,
                )
                for b, s in enumerate(specs):
                    wave[b, min(s[2], needed):] = 0
                t["read"] += time.perf_counter() - t0
                nbytes["wave_up"] += wave.nbytes

                t0 = time.perf_counter()
                counts = [params.num_output_frames(s[2]) for s in specs]
                if args.legacy:
                    feats = np.array(
                        dsp.batched_logmel_with_power(wave, params)
                    )
                    for b, c in enumerate(counts):
                        feats[b, c:] = pad_value
                    nbytes["fbank_down"] += feats.nbytes
                else:
                    # production path: device-resident, sentinel in-graph;
                    # the device work + upload surfaces in the stage sync
                    feats = dsp.batched_logmel_masked(
                        wave, np.asarray(counts, np.int32), params,
                        pad_value,
                    )
                t["fbank"] += time.perf_counter() - t0
                batch.append((feats, np.array(counts, np.int64)))

            t0 = time.perf_counter()
            for key, max_len in [
                ("motion_p", tm), ("motion_s", tm),
                ("lead_motion_p", lead_tm), ("lead_motion_s", lead_tm),
                ("target", tm),
            ]:
                arrs = [r[key] for r in raws]
                lengths = np.array([a.shape[0] for a in arrs], np.int64)
                out = np.full((len(arrs), max_len, arrs[0].shape[-1]),
                              pad_value, np.float32)
                for b, a in enumerate(arrs):
                    out[b, : a.shape[0]] = a
                batch.append((out, lengths))
            t["pad"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            staged = [
                (jax.device_put(d), jax.device_put(n)) for d, n in batch
            ]
            # force the transfers to complete: tiny readback touching every
            # leaf through one fused scalar
            s = sum(jax.numpy.sum(d[:, 0, 0]) for d, _ in staged)
            float(s)
            t["stage"] += time.perf_counter() - t0
            nbytes["stage_up"] += sum(d.nbytes for d, _ in batch)

        total = time.perf_counter() - t_epoch0
        print(json.dumps({
            "epoch": epoch,
            "phase_s": {k: round(v, 3) for k, v in t.items()},
            "accounted_s": round(sum(t.values()), 3),
            "epoch_s": round(total, 3),
            "frames": frames,
            "frames_per_s_loader_only": round(frames / total, 1),
            "mb": {k: round(v / 1e6, 1) for k, v in nbytes.items()},
        }))


if __name__ == "__main__":
    main()
