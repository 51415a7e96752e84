"""Inference / evaluation CLI (reference visualize_metaformer main,
/root/reference/mr_gen/utils/visualize/visualize_metaformer.py:367-385).

Loads a checkpoint, builds manifests over an eval corpus, runs batched
full-generation rollouts with speed.log timing, writes genrt metrics,
rendered comparison frames and nod plots.

    python -m multimodalreactiongeneration_tpu.infer.cli \
        --config configs/lstmformer.yaml \
        model_path=ckpts/exp/V12-0.0123 data_dir=/corpus output_path=./viz
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from multimodalreactiongeneration_tpu.data.databuild_nx import DataBuilderNX
from multimodalreactiongeneration_tpu.data.dataset import (
    BatchLoader,
    SegmentDatasetNX,
)
from multimodalreactiongeneration_tpu.infer.generate import generation_loss
from multimodalreactiongeneration_tpu.infer.visualize import (
    generation_speed_log,
    nod_pitch_plot,
    render_comparison,
)
from multimodalreactiongeneration_tpu.models import build_model
from multimodalreactiongeneration_tpu.train.checkpoint import load_checkpoint
from multimodalreactiongeneration_tpu.train.losses import build_loss
from multimodalreactiongeneration_tpu.utils.config import load_config
from multimodalreactiongeneration_tpu.utils.logging import set_logger


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = load_config(args.config, args.overrides)
    logger = set_logger("visualize", cfg.get("log_dir", "log"))
    model_type = cfg.get("model_type", cfg.exp.use_model)
    output_dir = cfg.get("output_path") or "visualize_out"
    os.makedirs(output_dir, exist_ok=True)

    model = build_model(model_type, cfg.model)
    params = load_checkpoint(cfg.model_path)["params"]

    builder = DataBuilderNX(cfg.data, logger)
    dataset = SegmentDatasetNX(builder.data_site, cfg.motion, cfg.audio)
    assert len(dataset) != 0, "no segments found in the eval corpus"
    loader = BatchLoader(
        dataset,
        np.arange(len(dataset)),
        batch_size=cfg.get("eval_batch_size", 8),
        pad_to_multiple=cfg.trainer.get("pad_to_multiple", 16),
        shuffle=False,
    )

    batches = [tuple(np.asarray(b[0]) for b in batch) for batch in loader]
    preds = generation_speed_log(
        model,
        params,
        model_type,
        batches,
        speed_log_path=os.path.join(output_dir, "speed.log"),
    )

    lossfun = build_loss(cfg.model.to_dict())
    losses = [
        float(generation_loss(p, b[-1], lossfun))
        for p, b in zip(preds, batches)
    ]
    logger.info(f"genrt_loss over {len(losses)} batches: {np.mean(losses):.6f}")

    # render + nod plot for the first sample of the first batch, using the
    # stats stored in its manifest's self-motion npz
    with open(dataset.data_list[0], "r", encoding="utf-8") as f:
        manifest = json.loads(f.readline())
    with np.load(manifest["self_motion"]["path"]) as z:
        stats = {
            k: z[k]
            for k in ("angle_mean", "angle_std", "centroid_mean", "centroid_std")
        }
    pred0 = preds[0][0]
    true0 = batches[0][-1][0]
    valid = true0[:, 0] != -100.0
    n = render_comparison(
        pred0[valid],
        true0[valid],
        stats,
        os.path.join(output_dir, "frames"),
        wav_path=manifest["partner_audio"]["path"],
        max_frames=cfg.get("max_render_frames", 50),
    )
    ratio = nod_pitch_plot(
        pred0[valid], true0[valid], stats, os.path.join(output_dir, "nod.png")
    )
    logger.info(f"rendered {n} frames; nod amplitude ratio: {ratio:.3f}")
    print(
        json.dumps(
            {
                "genrt_loss": float(np.mean(losses)),
                "nod_ratio": ratio,
                "batches": len(batches),
                "output": output_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
