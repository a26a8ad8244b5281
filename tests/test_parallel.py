"""Multi-device sharding tests — run in a subprocess with an 8-way
virtual CPU mesh (the in-process backend is pinned to the single TPU)."""

import pathlib

from conftest import run_in_cpu_mesh

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_dryrun_multichip_8():
    out = run_in_cpu_mesh(
        "import sys; sys.path.insert(0, %r); "
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
        % str(REPO)
    )
    assert "ok" in out


def test_data_parallel_eval_matches_single_device():
    script = f"""
import sys; sys.path.insert(0, {str(REPO)!r})
import numpy as np, jax, jax.numpy as jnp
from vtm.merge.policy import MergePolicy
from vtm.models.videomae import VideoMAE, VideoMAEConfig
from vtm.parallel.mesh import make_mesh, replicate, shard_batch
from vtm.train.train_step import make_eval_step

config = VideoMAEConfig(img_size=32, patch_size=16, num_frames=4, tubelet_size=2,
                        embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0, num_classes=5)
module = VideoMAE(config=config, policy=MergePolicy(rs=(1, 1), mode='merge'))
x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 4, 32, 32, 3)), dtype=jnp.float32)
params = module.init(jax.random.key(0), x[:1])['params']

single = np.asarray(make_eval_step(module)(params, x))

mesh = make_mesh()
sharded = np.asarray(make_eval_step(module, mesh)(replicate(mesh, params), shard_batch(mesh, x)))
np.testing.assert_allclose(single, sharded, rtol=1e-5, atol=1e-5)
print('dp-parity ok')
"""
    out = run_in_cpu_mesh(script)
    assert "dp-parity ok" in out
