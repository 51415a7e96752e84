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
    render_segment_video,
    save_pose_strips,
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

    from multimodalreactiongeneration_tpu.utils.compile_cache import (
        DEFAULT_CACHE_DIR,
        enable_compile_cache,
    )

    enable_compile_cache(cfg.get("compile_cache_dir", DEFAULT_CACHE_DIR))
    output_dir = cfg.get("output_path") or "visualize_out"
    os.makedirs(output_dir, exist_ok=True)

    model = build_model(model_type, cfg.model)
    params = load_checkpoint(cfg.model_path)["params"]

    builder = DataBuilderNX(cfg.data, logger)
    dataset = SegmentDatasetNX(builder.data_site, cfg.motion, cfg.audio)
    assert len(dataset) != 0, "no segments found in the eval corpus"
    batch_size = int(cfg.get("eval_batch_size", 8))
    loader = BatchLoader(
        dataset,
        np.arange(len(dataset)),
        batch_size=batch_size,
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

    # a fixed face cloud re-posed per frame, like the reference's
    # sample.head (visualize_metaformer.py:57-61); pose-only dots if unset
    face = None
    face_path = cfg.get("face_head_path")
    if face_path:
        from multimodalreactiongeneration_tpu.data.head_io import (
            load_head_frame,
        )

        face = load_head_frame(face_path).face

    # render EVERY eval segment end-to-end (reference gen_head_motion
    # loops all batches): muxed .mp4 per segment when ffmpeg is present,
    # PNG frame sequences otherwise
    from multimodalreactiongeneration_tpu.infer.video import have_ffmpeg

    use_video = have_ffmpeg() and not cfg.get("render_png_only", False)
    max_frames = cfg.get("max_render_frames")
    data_fps = float(cfg.data.get("fps", 25.0))
    pred_fps = float(cfg.model.get("pred_fps", 12.5))
    n_frames, ratios = 0, []
    for bi, (pred_b, batch) in enumerate(zip(preds, batches)):
        true_b = batch[-1]
        for ii in range(pred_b.shape[0]):
            item = bi * batch_size + ii
            if item >= len(dataset):
                break
            with open(dataset.data_list[item], "r", encoding="utf-8") as f:
                manifest = json.loads(f.readline())
            with np.load(manifest["self_motion"]["path"]) as z:
                stats = {
                    k: z[k]
                    for k in (
                        "angle_mean",
                        "angle_std",
                        "centroid_mean",
                        "centroid_std",
                    )
                }
            seg = os.path.splitext(
                os.path.basename(dataset.data_list[item])
            )[0]
            pred = pred_b[ii]
            true = true_b[ii]
            valid = true[:, 0] != -100.0
            pred, true = pred[valid], true[valid]
            wav = manifest["partner_audio"]["path"]
            # reference side-by-side mode: the PARTNER's movie frame next
            # to the pose board (gen_head_motion's host/comp swap rule,
            # visualize_metaformer.py:196-204)
            source = None
            src_dir = cfg.get("source_video_dir")
            if use_video and src_dir:
                target_path = manifest["self_motion"]["path"]
                who = os.path.basename(target_path)
                data_name = os.path.basename(os.path.dirname(target_path))
                partner = "comp" if "host" in who else "host"
                movie = os.path.join(src_dir, data_name, f"{partner}.mp4")
                session_movie = os.path.join(
                    src_dir, data_name, "movie.mp4"
                )
                from multimodalreactiongeneration_tpu.corpus.video import (
                    HalfVideoSource,
                    open_video,
                )

                if os.path.exists(movie):
                    source = open_video(movie)
                elif os.path.exists(session_movie):
                    # self-built corpora keep only the side-by-side
                    # movie.mp4 (corpus/landmarks.py splits in-stream);
                    # serve the partner's half as a view
                    source = HalfVideoSource(
                        open_video(session_movie),
                        0 if partner == "comp" else 1,
                    )
            if use_video:
                n_frames += render_segment_video(
                    pred,
                    true,
                    stats,
                    os.path.join(output_dir, seg, f"{seg}.mp4"),
                    wav_path=wav,
                    seq=manifest["self_motion"]["seq"],
                    data_fps=data_fps,
                    pred_fps=pred_fps,
                    face=face,
                    max_frames=max_frames,
                    source=source,
                )
            else:
                n_frames += render_comparison(
                    pred,
                    true,
                    stats,
                    os.path.join(output_dir, seg),
                    wav_path=wav,
                    max_frames=max_frames,
                    face=face,
                )
            save_pose_strips(
                pred, true, stats, os.path.join(output_dir, seg), face=face
            )
            ratios.append(
                nod_pitch_plot(
                    pred,
                    true,
                    stats,
                    os.path.join(output_dir, seg, "nod.png"),
                )
            )
    ratio = float(np.mean(ratios)) if ratios else 0.0
    logger.info(
        f"rendered {n_frames} frames over {len(ratios)} segments "
        f"({'mp4' if use_video else 'png'}); "
        f"mean nod amplitude ratio: {ratio:.3f}"
    )
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
