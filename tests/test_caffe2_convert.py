"""Caffe2 name-translation parity vs the reference regex table, plus an
end-to-end caffe2-blob -> flax-tree conversion check."""

import numpy as np

from conftest import load_reference_module


def test_caffe2_names_match_reference():
    ref = load_reference_module(
        "slowfast/utils/c2_model_loading.py", "ref_c2_loading"
    )
    from vtm.checkpoints.convert import caffe2_name_to_pytorch

    convert = ref.get_name_convert_func()
    names = [
        "conv1_w", "res_conv1_bn_s", "res_conv1_bn_b",
        "res2_0_branch2a_w", "res2_0_branch2a_bn_s",
        "res2_0_branch2a_bn_rm", "res2_0_branch2a_bn_riv",
        "res3_1_branch1_w", "res5_2_branch2c_bn_b",
        "t_conv1_w", "t_res2_0_branch2b_w",
        "t_pool1_subsample_w", "t_pool1_subsample_bn_s",
        "t_res2_0_branch2c_bn_subsample_w",
        "nonlocal_conv3_1_theta_w", "nonlocal_conv3_1_bn_s",
        "pred_w", "pred_b", "conv1_xy_w",
        "conv_5_w", "lin_5_w",
    ]
    for name in names:
        assert caffe2_name_to_pytorch(name) == convert(name), name


def test_caffe2_blob_conversion_structure():
    from vtm.checkpoints.convert import convert_caffe2

    rng = np.random.default_rng(0)
    blobs = {
        "conv1_w": rng.standard_normal((8, 3, 1, 7, 7)).astype(np.float32),
        "res_conv1_bn_s": np.ones(8, np.float32),
        "res_conv1_bn_b": np.zeros(8, np.float32),
        "res_conv1_bn_rm": np.zeros(8, np.float32),
        "res_conv1_bn_riv": np.ones(8, np.float32),
        "res2_0_branch2a_w": rng.standard_normal((8, 8, 3, 1, 1)).astype(np.float32),
        "pred_w": rng.standard_normal((10, 64)).astype(np.float32),
        "pred_b": np.zeros(10, np.float32),
        "conv1_w_momentum": np.zeros(1, np.float32),  # skipped
        "model_iter": np.zeros(1, np.float32),  # skipped
    }
    params, stats = convert_caffe2(blobs)
    assert params["s1"]["pathway0_stem"]["conv"]["kernel"].shape == (1, 7, 7, 3, 8)
    assert params["s1"]["pathway0_stem"]["bn"]["scale"].shape == (8,)
    assert stats["s1"]["pathway0_stem"]["bn"]["mean"].shape == (8,)
    assert params["head"]["projection"]["kernel"].shape == (64, 10)
    assert "conv1_w_momentum" not in str(params)
