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


def test_donation_alias_correctness():
    """SURVEY §4 sanitizer analog: the donated train step must (a) produce
    the same numbers as an un-donated run and (b) actually invalidate the
    donated buffers (no silent aliasing back to live arrays)."""
    script = f"""
import sys; sys.path.insert(0, {str(REPO)!r})
import numpy as np, jax, jax.numpy as jnp
from vtm.config import get_cfg
from vtm.merge.policy import MergePolicy
from vtm.models.videomae import VideoMAE, VideoMAEConfig
from vtm.parallel.mesh import make_mesh, replicate, shard_batch
from vtm.train.optimizer import construct_optimizer
from vtm.train.train_step import make_train_step

config = VideoMAEConfig(img_size=32, patch_size=16, num_frames=4, tubelet_size=2,
                        embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0, num_classes=5)
module = VideoMAE(config=config, policy=MergePolicy(rs=(1, 1), mode='merge'))
rng = np.random.default_rng(0)
frames_np = rng.standard_normal((8, 4, 32, 32, 3)).astype(np.float32)
labels_np = rng.integers(0, 5, size=(8,))
params0 = module.init(jax.random.key(0), jnp.asarray(frames_np[:1]))['params']
cfg = get_cfg(); cfg.SOLVER.OPTIMIZING_METHOD = 'adamw'
tx, _ = construct_optimizer(cfg, params0, num_layers=config.depth)

# un-donated single-device run
plain = make_train_step(module, tx, 'cross_entropy', multi_head=False, mesh=None)
p_plain, _, loss_plain, logits_plain, _ = plain(
    params0, tx.init(params0), jnp.asarray(frames_np), jnp.asarray(labels_np), None)

# donated mesh run on fresh buffers
mesh = make_mesh()
params = replicate(mesh, params0)
opt_state = tx.init(params)
donated_leaf = jax.tree_util.tree_leaves(params)[0]
step = make_train_step(module, tx, 'cross_entropy', multi_head=False, mesh=mesh)
p_don, _, loss_don, logits_don, _ = step(
    params, opt_state, shard_batch(mesh, jnp.asarray(frames_np)),
    shard_batch(mesh, jnp.asarray(labels_np)), None)

# tolerances: an 8-way sharded compile reassociates reductions (~1e-4
# drift); donation-aliasing corruption would be orders of magnitude off
np.testing.assert_allclose(float(loss_plain), float(loss_don), rtol=1e-4, atol=1e-4)
np.testing.assert_allclose(np.asarray(logits_plain), np.asarray(logits_don), rtol=1e-2, atol=1e-3)
for a, b in zip(jax.tree_util.tree_leaves(p_plain), jax.tree_util.tree_leaves(p_don)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3)
assert donated_leaf.is_deleted(), 'donated param buffer still live — donation silently dropped'
print('donation-parity ok')
"""
    out = run_in_cpu_mesh(script)
    assert "donation-parity ok" in out


def test_tensor_parallel_matches_single_device():
    """2x4 (data, model) mesh with Megatron-style param cuts
    (vtm/parallel/sharding.py): eval logits and one train step must
    match the unsharded single-device run; qkv/fc1 kernels must actually
    be sharded over the model axis."""
    script = f"""
import sys; sys.path.insert(0, {str(REPO)!r})
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from vtm.config import get_cfg
from vtm.merge.policy import MergePolicy
from vtm.models.videomae import VideoMAE, VideoMAEConfig
from vtm.parallel.mesh import make_mesh, shard_batch
from vtm.parallel.sharding import shard_params, tp_param_specs
from vtm.train.optimizer import construct_optimizer
from vtm.train.train_step import make_eval_step, make_train_step

config = VideoMAEConfig(img_size=32, patch_size=16, num_frames=4, tubelet_size=2,
                        embed_dim=32, depth=2, num_heads=4, mlp_ratio=2.0, num_classes=5)
module = VideoMAE(config=config, policy=MergePolicy(rs=(1, 1), mode='merge'))
rng = np.random.default_rng(0)
frames_np = rng.standard_normal((8, 4, 32, 32, 3)).astype(np.float32)
labels_np = rng.integers(0, 5, size=(8,))
params0 = module.init(jax.random.key(0), jnp.asarray(frames_np[:1]))['params']

single = np.asarray(make_eval_step(module)(params0, jnp.asarray(frames_np)))

mesh = make_mesh(model_parallel=4)
assert mesh.shape == {{'data': 2, 'model': 4}}
specs = tp_param_specs(params0)
# the column cut is real: qkv kernel sharded over 'model'
assert specs['blocks_0']['attn']['qkv']['kernel'] == P(None, 'model')
assert specs['blocks_0']['mlp']['fc2']['kernel'] == P('model', None)
params = shard_params(mesh, params0, specs)
qkv = params['blocks_0']['attn']['qkv']['kernel']
assert not qkv.sharding.is_fully_replicated, qkv.sharding

tp_eval = make_eval_step(module, mesh, param_specs=specs)
got = np.asarray(tp_eval(params, shard_batch(mesh, jnp.asarray(frames_np))))
np.testing.assert_allclose(single, got, rtol=1e-4, atol=1e-4)

# one tp train step matches the unsharded step
cfg = get_cfg(); cfg.SOLVER.OPTIMIZING_METHOD = 'adamw'
tx, _ = construct_optimizer(cfg, params0, num_layers=config.depth)
plain = make_train_step(module, tx, 'cross_entropy', multi_head=False)
p_ref, _, loss_ref, _, _ = plain(params0, tx.init(params0), jnp.asarray(frames_np), jnp.asarray(labels_np), None)

opt_state = tx.init(params)
step = make_train_step(module, tx, 'cross_entropy', multi_head=False, mesh=mesh, param_specs=specs)
p_tp, _, loss_tp, _, _ = step(params, opt_state, shard_batch(mesh, jnp.asarray(frames_np)),
                              shard_batch(mesh, jnp.asarray(labels_np)), None)
np.testing.assert_allclose(float(loss_ref), float(loss_tp), rtol=1e-4, atol=1e-4)
for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_tp)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3)
# updated params keep their tp sharding (no silent gather to replicated)
assert not jax.tree_util.tree_leaves(
    p_tp['blocks_0']['attn']['qkv']
)[0].sharding.is_fully_replicated
print('tp-parity ok')
"""
    out = run_in_cpu_mesh(script)
    assert "tp-parity ok" in out


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


def test_init_distributed_topology():
    """NUM_SHARDS==1 is a no-op; >1 maps the reference's tcp://
    init_method onto jax.distributed.initialize."""
    import jax

    from vtm.config import get_cfg
    from vtm.parallel.mesh import init_distributed

    cfg = get_cfg()
    init_distributed(cfg)  # no-op, must not raise

    calls = {}
    orig = jax.distributed.initialize
    jax.distributed.initialize = lambda **kw: calls.update(kw)
    try:
        cfg.NUM_SHARDS = 4
        cfg.SHARD_ID = 2
        cfg.INIT_METHOD = "tcp://host0:1234"
        init_distributed(cfg)
    finally:
        jax.distributed.initialize = orig
    assert calls == {
        "coordinator_address": "host0:1234",
        "num_processes": 4,
        "process_id": 2,
    }


def test_batch_cap_picks_largest_divisor(caplog):
    """make_mesh(batch_cap=) is the reference-equivalent of choosing
    NUM_GPUS (defaults.py:1266-1270): the data axis becomes the largest
    divisor of the batch that fits, spare devices stay out of the mesh,
    and the cap is logged when devices are left idle."""
    import logging

    import jax

    from vtm.parallel.mesh import make_mesh

    n = len(jax.devices())
    assert n == 8, "test expects the 8-device CPU mesh"
    assert make_mesh(batch_cap=2).shape["data"] == 2
    assert make_mesh(batch_cap=4).shape["data"] == 4
    assert make_mesh(batch_cap=8).shape["data"] == 8
    assert make_mesh(batch_cap=12).shape["data"] == 6
    assert make_mesh(batch_cap=3).shape["data"] == 3
    with caplog.at_level(logging.WARNING, logger="vtm.parallel.mesh"):
        mesh = make_mesh(batch_cap=13)  # prime > devices: 1-way
    assert mesh.shape["data"] == 1
    assert any("left idle" in r.message for r in caplog.records)
    # composes with tensor parallelism: cap applies to the data axis
    m = make_mesh(batch_cap=2, model_parallel=2)
    assert m.shape == {"data": 2, "model": 2}
