"""End-to-end trainer smoke tests: synthetic dataset -> vae_train ->
seg_train -> domain_adaptation (dh + ft1) -> test_only eval, all through the
real CLI argument surface at 32^3 on CPU.

This is the reference's full NIH->target workflow (README.md:50-66) in
miniature; also covers checkpoint handoff between stages (--load_prefix /
--load_prefix_vae / --load_prefix_joint) and the score-JSON contract.
"""

import json
import os

import numpy as np
import pytest

from vae_segmentation_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    write_synthetic_dataset(str(root / "data"), n_train=4, n_val=2, size=40,
                            seed=0)
    os.makedirs(root / "lists" / "data", exist_ok=True)
    (root / "lists" / "data" / "Multi_all.json").write_bytes(
        (root / "data" / "Multi_all.json").read_bytes())
    old = os.getcwd()
    os.chdir(root)
    yield root
    os.chdir(old)


def _common(root):
    return [
        "--train_list", "NIH_train", "--val_list", "NIH_val",
        "--data_root", str(root / "data"),
        "--val_data_root", str(root / "data"),
        "--data_path", "data/Multi_all.json",
        "--eval_epoch", "1", "--save_epoch", "1", "--max_epoch", "1",
        "-b", "2", "--patch_size", "32", "32", "32", "--num_workers", "2",
    ]


@pytest.mark.slow
def test_full_workflow(workdir):
    from vae_segmentation_tpu.cli.source_main import main as src_main
    from vae_segmentation_tpu.cli.target_main import main as tgt_main

    src_main(["vae_s", "--method", "vae_train"] + _common(workdir))
    assert os.path.exists("3dmodel/vae_s/best_model.ckpt")
    assert os.path.exists("tensorboard/vae_s/score_0.json")

    # seg_train with the reference VAE monitor + eval artifacts: npy dumps
    # incl. gt_recon (main_source.py:721-761) and the val/train TB panels
    src_main(["seg_s", "--method", "seg_train", "--load_prefix_vae", "vae_s",
              "--save_eval_result", "--save_more_reference"]
             + _common(workdir))
    assert os.path.exists("3dmodel/seg_s/best_model.ckpt")
    for stem in ("0_0_pred.join", "0_0_pic", "0_0_gt", "0_0_gt_recon"):
        assert os.path.exists(f"result/seg_s/{stem}.npy"), stem

    # flagship: teacher-student with dh schedule + per-case TTT; 2 outer
    # epochs so the epoch-0 skip is exercised AND a training epoch runs.
    # --save_eval_result / --save_more_reference drive the npy-dump and
    # TB-panel contracts (main_target.py:916-936,999-1010)
    tgt_main(["dom_s", "--method", "domain_adaptation",
              "--load_prefix", "seg_s", "--load_prefix_vae", "vae_s",
              "--lambda_vae", "1.0", "--domain_loss_type", "8",
              "--val_finetune", "1", "--save_eval_result",
              "--save_more_reference"]
             + _common(workdir)[:-10]
             + ["--eval_epoch", "1", "--save_epoch", "2", "--max_epoch", "2",
                "-b", "2", "--patch_size", "32", "32", "32",
                "--num_workers", "2"])
    assert os.path.exists("3dmodel/dom_s/best_model.ckpt")
    scores = json.load(open("tensorboard/dom_s/score_1.json"))
    noft = json.load(open("tensorboard/dom_s/score_noft_1.json"))
    assert len(scores) == 2 and len(noft) == 2
    for v in scores.values():
        assert 0.0 <= v <= 1.0
    # npy eval artifacts: epoch 0 is the only epoch%10==0 epoch here
    for stem in ("0_0_pred.join", "0_0_pic", "0_0_gt", "0_1_pred.join"):
        a = np.load(f"result/dom_s/{stem}.npy")
        assert a.shape[0] == 1 and a.ndim == 5, (stem, a.shape)

    # eval-only reload of the trained joint model
    tgt_main(["dom_eval", "--method", "domain_adaptation",
              "--load_prefix_joint", "dom_s", "--test_only"]
             + _common(workdir))
    eval_scores = json.load(open("tensorboard/dom_eval/score_0.json"))
    assert len(eval_scores) == 2

    # --pseudo_list source-replay branch (restricted loss + full teacher
    # copy cadence + tag decay), 2 epochs so training actually runs
    tgt_main(["dom_ps", "--method", "domain_adaptation",
              "--load_prefix", "seg_s", "--load_prefix_vae", "vae_s",
              "--pseudo_list", "NIH_train", "--pseudo_pan_index", "1",
              "--pseudo_data_root", str(workdir / "data"),
              "--lambda_vae", "1.0", "--domain_loss_type", "8",
              "--pseudo_save_epoch", "1", "--tag"]
             + _common(workdir)[:-10]
             + ["--eval_epoch", "1", "--save_epoch", "2", "--max_epoch", "2",
                "-b", "2", "--patch_size", "32", "32", "32",
                "--num_workers", "2"])
    assert json.load(open("tensorboard/dom_ps/score_1.json"))


def test_val_batch_gt1_same_scores(workdir):
    """--val_batch 2 must produce the SAME per-case score dict as the
    reference's batch-1 loop (per-sample eval steps, VERDICT round-2 #8)."""
    import jax

    from vae_segmentation_tpu.cli import common
    from vae_segmentation_tpu.core.config import parse_source_args
    from vae_segmentation_tpu.eval.evaluate import (make_seg_eval_step,
                                                    run_eval)
    from vae_segmentation_tpu.models import SegUNet

    cfg = parse_source_args(["vb_probe", "--method", "seg_train",
                             *_common(workdir)])
    model = SegUNet(n_class=2)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        np.zeros((1, 32, 32, 32, 1), np.float32))["params"]
    step = make_seg_eval_step(model, 2)
    results = {}
    for vb in (1, 2):
        cfg2 = cfg.__class__(**{**cfg.__dict__, "val_batch": vb})
        loader = common.with_image_norm(common.build_val_loader(
            cfg2, data_root=cfg.val_data_root, list_key=cfg.val_list,
            pan_index=cfg.pan_index))
        mean, scores = run_eval(loader, step, params)
        results[vb] = (mean, scores)
    assert results[1][1].keys() == results[2][1].keys()
    for k in results[1][1]:
        assert abs(results[1][1][k] - results[2][1][k]) < 1e-5, k
    assert abs(results[1][0] - results[2][0]) < 1e-5


def test_sliding_window_eval_cli(workdir):
    """--eval_mode sliding_window end-to-end: the full-volume sweep drives
    validation for both trainers, scores keyed identically to the crop
    path, and ft1 composes (per-case crop finetune -> full-volume sweep
    with the finetuned student, score_noft from the plain student)."""
    from vae_segmentation_tpu.cli.source_main import main as src_main
    from vae_segmentation_tpu.cli.target_main import main as tgt_main

    src_main(["vae_sw", "--method", "vae_train"] + _common(workdir))
    src_main(["seg_sw", "--method", "seg_train", "--eval_mode",
              "sliding_window", "--sw_overlap", "0.5"] + _common(workdir))
    sw_scores = json.load(open("tensorboard/seg_sw/score_0.json"))
    assert sorted(sw_scores) == ["0", "1"]  # crop-path index convention
    for v in sw_scores.values():
        assert 0.0 <= v <= 1.0

    tgt_main(["dom_sw", "--method", "domain_adaptation",
              "--load_prefix", "seg_sw", "--load_prefix_vae", "vae_sw",
              "--lambda_vae", "1.0", "--domain_loss_type", "8",
              "--val_finetune", "1", "--eval_mode", "sliding_window",
              "--test_only"] + _common(workdir))
    scores = json.load(open("tensorboard/dom_sw/score_0.json"))
    noft = json.load(open("tensorboard/dom_sw/score_noft_0.json"))
    assert sorted(scores) == ["0", "1"] and sorted(noft) == ["0", "1"]
