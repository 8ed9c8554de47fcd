"""CLI coverage for the long-tail methods of both trainers — every
`--method` the reference dispatches must run end-to-end (1 outer epoch,
32^3, synthetic data): joint_train, cached-pseudo domain_adaptation,
embed_train, refine_vae, sep_joint_train (main_source.py:249-275);
vae_train, discriminator_train, domain_adaptation_dis (main_target.py
:316-344). The flagship domain_adaptation paths live in test_cli.py."""

import json
import os

import numpy as np
import pytest

from vae_segmentation_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_methods")
    write_synthetic_dataset(str(root / "data"), n_train=2, n_val=1, size=40,
                            seed=3)
    os.makedirs(root / "lists" / "data", exist_ok=True)
    (root / "lists" / "data" / "Multi_all.json").write_bytes(
        (root / "data" / "Multi_all.json").read_bytes())
    old = os.getcwd()
    os.chdir(root)
    yield root
    os.chdir(old)


def _common(root, epochs=1):
    return [
        "--train_list", "NIH_train", "--val_list", "NIH_val",
        "--data_root", str(root / "data"),
        "--val_data_root", str(root / "data"),
        "--data_path", "data/Multi_all.json",
        "--eval_epoch", "1", "--save_epoch", str(epochs),
        "--max_epoch", str(epochs),
        "-b", "2", "--patch_size", "32", "32", "32", "--num_workers", "2",
    ]


@pytest.fixture(scope="module")
def pretrained(workdir):
    """vae + seg checkpoints the composite methods load from."""
    from vae_segmentation_tpu.cli.source_main import main as src_main

    src_main(["vae_p", "--method", "vae_train"] + _common(workdir))
    src_main(["seg_p", "--method", "seg_train"] + _common(workdir, epochs=2))
    return workdir


def _score(prefix, epoch=0):
    return json.load(open(f"tensorboard/{prefix}/score_{epoch}.json"))


def test_joint_train(pretrained, workdir):
    from vae_segmentation_tpu.cli.source_main import main as src_main

    src_main(["jt", "--method", "joint_train", "--load_prefix", "seg_p",
              "--load_prefix_vae", "vae_p", "--lambda_vae", "0.1"]
             + _common(workdir, epochs=2))
    assert os.path.exists("3dmodel/jt/best_model.ckpt")
    assert _score("jt", 1)


def test_source_domain_adaptation_cached_pseudo(pretrained, workdir):
    from vae_segmentation_tpu.cli.source_main import main as src_main

    src_main(["da_src", "--method", "domain_adaptation",
              "--load_prefix", "seg_p", "--load_prefix_vae", "vae_p",
              "--lambda_vae", "0.5", "--mode", "1"]
             + _common(workdir, epochs=2))
    # epoch-0 teacher predictions cached per case index
    assert os.path.exists("domain_cache/da_src/0_pred.npy")
    assert _score("da_src", 1)


def test_embed_and_refine_vae(pretrained, workdir):
    from vae_segmentation_tpu.cli.source_main import main as src_main

    src_main(["emb", "--method", "embed_train", "--load_prefix_vae", "vae_p"]
             + _common(workdir, epochs=2))
    assert _score("emb", 1)
    src_main(["rv", "--method", "refine_vae", "--load_prefix_joint", "emb"]
             + _common(workdir))
    assert _score("rv")


def test_sep_joint_train(pretrained, workdir):
    from vae_segmentation_tpu.cli.source_main import main as src_main

    src_main(["sj", "--method", "sep_joint_train", "--load_prefix", "seg_p",
              "--load_prefix_vae", "vae_p"] + _common(workdir, epochs=2))
    assert _score("sj", 1)


def test_target_vae_and_discriminator(pretrained, workdir):
    from vae_segmentation_tpu.cli.target_main import main as tgt_main

    tgt_main(["vae_tgt", "--method", "vae_train"] + _common(workdir))
    assert _score("vae_tgt")

    # score.json realism targets for the discriminator
    with open(workdir / "data" / "score.json", "w") as f:
        json.dump({"0000": 0.9, "0001": 0.2}, f)
    tgt_main(["dis", "--method", "discriminator_train"]
             + _common(workdir, epochs=2))
    assert _score("dis", 1)


def test_domain_adaptation_dis(pretrained, workdir):
    from vae_segmentation_tpu.cli.target_main import main as tgt_main

    tgt_main(["dad", "--method", "domain_adaptation_dis",
              "--load_prefix", "seg_p", "--lambda_vae", "0.1"]
             + _common(workdir, epochs=2))
    assert _score("dad", 1)
