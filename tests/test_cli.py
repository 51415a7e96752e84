"""Full CLI training runs on synthetic corpora (all three model families)."""

import os

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.train.cli import main
from tests.fixtures import make_synthetic_corpus, make_synthetic_corpus_v1


pytestmark = pytest.mark.slow
SMALL_STREAMING = [
    "hidden_size=32",
    "bottleneck_size=8",
    "batch_size=2",
    "max_epochs=1",
    "optim_epochs=2",
    "lr=1e-3",
    "motion.max_len=150",
    "motion.min_len=50",
    "motion.shift_len=150",
    "motion.leading_len=24",
    "callbacks.save_top_k=1",
    "exp.train_rate=0.5",
    "exp.valid_rate=0.25",
]


@pytest.fixture(scope="module")
def corpus_nx(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_corpus")
    return make_synthetic_corpus(str(root), n_sessions=1, seconds=60.0)


def _run(config, corpus, tmp_path, extra):
    cwd = os.getcwd()
    workdir = tmp_path / "work"
    workdir.mkdir()
    os.chdir(workdir)  # databuild caches under ./data
    try:
        result = main(
            [
                "--config",
                os.path.join(cwd, config),
                f"data_dir={corpus}",
                f"ckpt_path={tmp_path}/ckpts",
                f"log_dir={tmp_path}/log",
                "name=test",
            ]
            + extra
        )
    finally:
        os.chdir(cwd)
    return result


def test_cli_lstm_with_sampling(corpus_nx, tmp_path):
    result = _run(
        "configs/lstm_with_sampling.yaml",
        corpus_nx,
        tmp_path,
        SMALL_STREAMING
        + ["model.sampler_hidden_size=16", "model.sampler_num_layers=1"],
    )
    assert result.epochs_run == 1
    assert np.isfinite(result.best_val_loss)
    assert "genrt_loss" in result.history[0]
    assert os.path.isdir(f"{tmp_path}/ckpts/test")


def test_cli_lstmformer(corpus_nx, tmp_path):
    result = _run(
        "configs/lstmformer.yaml",
        corpus_nx,
        tmp_path,
        SMALL_STREAMING
        + [
            "model.num_block=2",
            "model.encoder_num_layer=1",
            "trainer.run_generation_eval=false",
        ],
    )
    assert result.epochs_run == 1
    assert np.isfinite(result.best_val_loss)


def test_cli_simple_lstm(tmp_path_factory, tmp_path):
    root = tmp_path_factory.mktemp("cli_corpus_v1")
    corpus = make_synthetic_corpus_v1(str(root), n_sessions=1, seconds=12.0)
    result = _run(
        "configs/simple_lstm.yaml",
        corpus,
        tmp_path,
        [
            "hidden_size=32",
            "lstm_size=16",
            "bottleneck_size=8",
            "batch_size=4",
            "max_epochs=1",
            "optim_epochs=2",
            "lr=1e-3",
            "data.sample_stride=8",
            "model.att_heads=4",
            "model.acostic_num_layers=1",
            "model.motion_num_layers=1",
            "model.decoder_num_layers=1",
            "model.decoder_mapping_size=16",
            "exp.train_rate=0.5",
            "exp.valid_rate=0.25",
            "callbacks.save_top_k=1",
        ],
    )
    assert result.epochs_run == 1
    assert np.isfinite(result.best_val_loss)


def test_cli_scheduled_sampling(corpus_nx, tmp_path):
    result = _run(
        "configs/lstm_with_sampling.yaml",
        corpus_nx,
        tmp_path,
        SMALL_STREAMING
        + [
            "model.sampler_hidden_size=16",
            "model.sampler_num_layers=1",
            "model.use_scheduled_sampling=true",
            "trainer.run_generation_eval=false",
        ],
    )
    assert result.epochs_run == 1
    assert np.isfinite(result.best_val_loss)
    assert np.isfinite(result.history[0]["train_loss"])


def test_eval_cli_renders_all_segments(corpus_nx, tmp_path, monkeypatch):
    """Train one epoch, then drive the eval CLI: speed.log + a rendered
    output per eval segment (mp4 path exercised via a fake encoder)."""
    import glob
    import json as _json

    result = _run(
        "configs/lstm_with_sampling.yaml",
        corpus_nx,
        tmp_path,
        SMALL_STREAMING
        + [
            "model.sampler_hidden_size=16",
            "model.sampler_num_layers=1",
            "trainer.run_generation_eval=false",
        ],
    )
    ckpt = os.path.join(f"{tmp_path}/ckpts/test", "last")
    assert os.path.isdir(ckpt)

    from multimodalreactiongeneration_tpu.infer import cli as infer_cli
    from multimodalreactiongeneration_tpu.infer import video as vid
    from tests.test_video import fake_encoder_cmd

    # route the mp4 branch through the fake encoder; skip the audio mux
    monkeypatch.setattr(vid, "have_ffmpeg", lambda: True)
    import multimodalreactiongeneration_tpu.infer.visualize as viz

    orig = viz.render_segment_video

    def patched(*args, **kw):
        kw["encoder_cmd"] = fake_encoder_cmd
        kw["runner"] = lambda cmd, check: None
        return orig(*args, **kw)

    monkeypatch.setattr(viz, "render_segment_video", patched)
    monkeypatch.setattr(infer_cli, "render_segment_video", patched)

    out = tmp_path / "viz"
    cwd = os.getcwd()
    os.chdir(tmp_path / "work")
    try:
        infer_cli.main(
            [
                "--config",
                os.path.join(cwd, "configs/lstm_with_sampling.yaml"),
                f"data_dir={corpus_nx}",
                f"model_path={ckpt}",
                f"output_path={out}",
                f"log_dir={tmp_path}/log",
                "name=test",
                "max_render_frames=4",
                "model.sampler_hidden_size=16",
                "model.sampler_num_layers=1",
            ]
            + SMALL_STREAMING
        )
    finally:
        os.chdir(cwd)

    assert os.path.exists(out / "speed.log")
    mp4s = glob.glob(str(out / "*" / "*.mp4"))
    nods = glob.glob(str(out / "*" / "nod.png"))
    assert len(mp4s) >= 1 and len(nods) == len(mp4s)


def test_cli_trains_on_2d_mesh(corpus_nx, tmp_path):
    """trainer.mesh_shape=[2,4] trains through Trainer with weight
    sharding over the 'model' axis on the 8-device virtual mesh."""
    result = _run(
        "configs/lstm_with_sampling.yaml",
        corpus_nx,
        tmp_path,
        SMALL_STREAMING
        + [
            "model.sampler_hidden_size=16",
            "model.sampler_num_layers=1",
            "trainer.mesh_shape=[2,4]",
            "trainer.run_generation_eval=false",
        ],
    )
    assert result.epochs_run == 1
    assert np.isfinite(result.best_val_loss)
