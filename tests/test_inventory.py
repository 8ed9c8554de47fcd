"""Coverage tests for the long tail of the reference's component inventory
(SURVEY.md section 2): GS conv variants, the host-side transform library,
and the legacy analysis utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ------------------------------------------------------------ GS variants

def test_gsconv_weights_sum_to_one_per_group(rng):
    from vae_segmentation_tpu.models.gs import GSConv3d, _gs_normalize_kernel

    m = GSConv3d(features=4, num_group=2, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 4)), jnp.float32)
    p = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(p, x)
    assert out.shape == (1, 8, 8, 8, 4)
    k = _gs_normalize_kernel(p["params"]["kernel"], 2)
    sums = np.asarray(jnp.sum(k.reshape(*k.shape[:3], 2, 2, 4), axis=4))
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)


def test_sconv_zero_mean_kernel_kills_dc(rng):
    from vae_segmentation_tpu.models.gs import SConv3d

    m = SConv3d(features=3, dtype=jnp.float32)
    const = jnp.full((1, 8, 8, 8, 2), 5.0, jnp.float32)
    p = m.init({"params": jax.random.PRNGKey(0)}, const)
    out = m.apply(p, const)
    # mean-centered weights: a constant input maps to (approximately) the
    # bias alone in the interior
    interior = np.asarray(out)[0, 2:-2, 2:-2, 2:-2]
    bias = np.asarray(p["params"]["bias"])
    np.testing.assert_allclose(interior, np.broadcast_to(bias, interior.shape),
                               atol=1e-4)


def test_segmentation_gs_forward(rng):
    from vae_segmentation_tpu.models.gs import SegmentationGS

    m = SegmentationGS(n_class=2, fmaps=(2, 3, 4, 5, 6, 8),
                       dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    p = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(p, x)
    assert out.shape == (1, 16, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(jnp.sum(out, -1)), 1.0, rtol=1e-3)


def test_gsconvtranspose_upsamples(rng):
    from vae_segmentation_tpu.models.gs import GSConvTranspose3d

    m = GSConvTranspose3d(features=3, num_group=1, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)), jnp.float32)
    p = m.init({"params": jax.random.PRNGKey(0)}, x)
    assert m.apply(p, x).shape == (1, 8, 8, 8, 3)


# --------------------------------------------------- host transform library

def test_host_transform_chain(tmp_path, rng):
    from vae_segmentation_tpu.data import host_transforms as T

    img = rng.normal(size=(20, 20, 20)).astype(np.float32) * 300
    lab = (rng.random((20, 20, 20)) > 0.8).astype(np.int16)
    case = tmp_path / "case0001"
    case.mkdir()
    np.save(case / "merge.npy",
            np.stack([img, lab], -1).astype(np.int16))

    chain = T.Compose([
        T.NumpyLoaderMultiMerge(fields=["venous"], root_dir=str(tmp_path),
                                load_mask=True, mask_index=[[0, 0], [1, 1]]),
        T.CopyField(fields=["venous"], to_field=["venous_origin"]),
        T.Clip(fields=["venous"], new_min=-200, new_max=400),
        T.CenterIntensities(fields=["venous"], subtrahend=100, divisor=300),
        T.PadToSize(fields=["venous"], size=(24, 24, 24), pad_val=-1024,
                    load_mask=True),
        T.Reshape(fields=["venous", "venous_pancreas"]),
        T.ExtendSqueeze(fields=["venous"], dimension=0, mode=1),
    ])
    ds = T.BaseDataset(["case0001/merge.npy"], transforms=chain)
    out = ds[0]
    assert out["id"] == "0001"
    assert out["venous"].shape == (1, 1, 1, 24, 24, 24)
    assert out["venous_pancreas"].shape == (1, 1, 24, 24, 24)
    assert out["venous"].max() <= 1.0
    assert out["venous_origin"].shape == (20, 20, 20)
    # binarize keeps {0,1}
    out2 = T.Binarize(fields=["venous_pancreas"])(dict(out))
    assert set(np.unique(out2["venous_pancreas"])) <= {0.0, 1.0}


def test_numpy_loader_multi_dict_paths(tmp_path, rng):
    from vae_segmentation_tpu.data import host_transforms as T

    img = rng.normal(size=(8, 8, 8)).astype(np.float32)
    lab = (rng.random((8, 8, 8)) > 0.5).astype(np.float32)
    np.save(tmp_path / "img.npy", img)
    np.save(tmp_path / "lab.npy", lab)
    loader = T.NumpyLoaderMulti(fields=["venous"], root_dir=str(tmp_path),
                                load_mask=True, load_pred=True)
    out = loader({"venous": "img.npy", "venous_pancreas": "lab.npy"})
    np.testing.assert_array_equal(out["venous"], img)
    np.testing.assert_array_equal(out["venous_pancreas"], lab)
    # absent/falsy companions are skipped, as in utils/utils.py:317-322
    assert "venous_pancreas_pred" not in out
    out2 = T.NumpyLoaderMulti(fields=["venous"],
                              root_dir=str(tmp_path))({"other": 1})
    assert out2 == {"other": 1}


def test_norm_batchnorm_branch(rng):
    """joint_model.py:12-13: norm_type=2 -> BatchNorm3d(momentum=0.1)."""
    from vae_segmentation_tpu.models.blocks import Norm

    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 3)) * 3 + 1, jnp.float32)
    m = Norm(norm_type=2)
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    assert "batch_stats" in variables
    out, updates = m.apply(variables, x, mutable=["batch_stats"])
    # train mode normalizes with batch statistics
    got = np.asarray(out)
    assert abs(got.mean()) < 1e-4 and abs(got.std() - 1.0) < 1e-2
    # running stats move toward the batch by torch momentum 0.1
    ra_mean = np.asarray(updates["batch_stats"]["BatchNorm_0"]["mean"])
    batch_mean = np.asarray(jnp.mean(x, axis=(0, 1, 2, 3)))
    np.testing.assert_allclose(ra_mean, 0.1 * batch_mean, rtol=1e-5)
    # eval mode consumes the running average without mutation
    m_eval = Norm(norm_type=2, use_running_average=True)
    out_eval = m_eval.apply({"params": variables.get("params", {}),
                             "batch_stats": updates["batch_stats"]}, x)
    assert out_eval.shape == x.shape


def test_pad_to_size_crops_when_larger(rng):
    from vae_segmentation_tpu.data import host_transforms as T

    d = {"venous": rng.normal(size=(30, 30, 30)).astype(np.float32)}
    out = T.PadToSize(fields=["venous"], size=(16, 16, 16),
                      random_subpadding=False)(d)
    assert out["venous"].shape == (16, 16, 16)


# ------------------------------------------------------------- legacy utils

def test_mutual_information_identical_is_high(rng):
    from vae_segmentation_tpu.utils import mutual_information_3d

    x = rng.normal(size=4096)
    same = mutual_information_3d(x, x)
    other = mutual_information_3d(x, rng.normal(size=4096))
    assert same > other


def test_plot_slides_board_shape(rng):
    from vae_segmentation_tpu.utils import plot_slides

    v = rng.normal(size=(9, 10, 12))
    board = plot_slides(v)
    assert board.shape == (11 * 3, 13 * 3, 3)
    assert 0.0 <= board.min() and board.max() <= 1.0


def test_synthesis_mask_excludes_bone_and_air():
    from vae_segmentation_tpu.utils import get_synthesis_mask

    vol = np.zeros((8, 8, 8), np.float32)
    vol[0, 0, 0] = 300.0   # bone
    vol[4, 4, 4] = -100.0  # air
    vol[2, 2, 2] = 50.0    # soft tissue
    out = get_synthesis_mask({"venous": vol})
    m = out["venous_syn_mask"]
    assert m[4, 4, 4] == 0 and m[0, 0, 0] == 0 and m[2, 2, 2] == 1


def test_get_parameter_number_counts(rng):
    from vae_segmentation_tpu.utils import get_parameter_number

    tree = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5)}}
    assert get_parameter_number(tree) == {"Total": 17, "Trainable": 17}
