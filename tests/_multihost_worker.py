"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Run as:  python tests/_multihost_worker.py <port> <process_id>

Each process brings up 2 virtual CPU devices (4 global), initializes the
process group through the PRODUCT code path (`cli.maybe_init_distributed`),
asserts its train-loader shard is disjoint from the peer's, runs ONE real
`make_train_step` on a cross-host sharded global batch, and verifies the
post-step parameters are bit-identical on both processes (the gradient
all-reduce actually synchronised them). Mirrors what the reference
validates by launching `torch.distributed.launch --nproc_per_node`
(`/root/reference/train.py:113-123`, `scripts/aanet_evaluate.sh:21-22`).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["AANET_TPU_DISTRIBUTED"] = "1"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize may force axon

import numpy as np  # noqa: E402
import optax  # noqa: E402

from aanet_tpu.cli import maybe_init_distributed  # noqa: E402

assert maybe_init_distributed(), "distributed init did not trigger"
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid, (jax.process_index(), pid)
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2, jax.local_device_count()

from jax.experimental import multihost_utils  # noqa: E402

from aanet_tpu.data.pipeline import make_train_loader  # noqa: E402
from aanet_tpu.models import AANet  # noqa: E402
from aanet_tpu.parallel.mesh import make_mesh, replicate, shard_batch  # noqa: E402
from aanet_tpu.train.optimizer import make_optimizer  # noqa: E402
from aanet_tpu.train.state import TrainState, create_train_state  # noqa: E402
from aanet_tpu.train.trainer import make_train_step  # noqa: E402


# ---- 1) loader shards must be disjoint and cover the dataset ------------
class _IdDataset:
    """12 samples; each sample's arrays are filled with its index."""

    def __len__(self):
        return 12

    def load(self, i, rng):
        return {"x": np.full((2,), float(i), np.float32)}


loader = make_train_loader(
    _IdDataset(), global_batch_size=4, epoch=0, num_workers=1
)
local_ids = sorted({int(v) for b in loader for v in b["x"][:, 0]})
assert len(local_ids) == 6, local_ids  # 12 samples / 2 hosts
gathered = multihost_utils.process_allgather(
    np.asarray(local_ids, np.int32)
)  # [2, 6]
mine, peer = gathered[pid], gathered[1 - pid]
assert not set(mine.tolist()) & set(peer.tolist()), gathered
assert set(gathered.ravel().tolist()) == set(range(12)), gathered

# ---- 2) one real data-parallel train step over the 4-device global mesh -
model = AANet(
    max_disp=24,
    feature_type="aanet",
    feature_pyramid_network=True,
    num_fusions=1,
    num_deform_blocks=1,
    no_feature_mdconv=True,
    refinement_type="stereodrnet",
)
mesh = make_mesh()  # all 4 global devices on the data axis
assert mesh.devices.size == 4

state0 = create_train_state(model, jax.random.PRNGKey(0), (32, 64), optax.identity())
tx = make_optimizer(state0.params, 1e-3, weight_decay=0.0)
state = TrainState.create(
    apply_fn=model.apply,
    params=state0.params,
    batch_stats=state0.batch_stats,
    tx=tx,
)
state = replicate(state, mesh)

# local shard of the global batch: 2 samples per host (4 global), with
# host-dependent content so the collectives genuinely mix data
rs = np.random.RandomState(100 + pid)
local = {
    "left": rs.rand(2, 32, 64, 3).astype(np.float32),
    "right": rs.rand(2, 32, 64, 3).astype(np.float32),
    "disp": np.full((2, 32, 64), 4.0, np.float32),
}
batch = shard_batch(local, mesh)
assert next(iter(batch.values())).shape[0] == 4  # global batch assembled

step = make_train_step(model, max_disp=24)
state, metrics = step(state, batch)
loss = float(metrics["total_loss"])
assert np.isfinite(loss), loss

# ---- 3) post-step params identical across processes ---------------------
leaves = jax.tree.leaves(jax.device_get(state.params))
checksum = np.float64(sum(float(np.abs(x).astype(np.float64).sum()) for x in leaves))
both = multihost_utils.process_allgather(np.asarray([checksum, loss]))
assert both[0][0] == both[1][0], both  # bit-identical param checksums
assert both[0][1] == both[1][1], both  # identical (global) loss

print(f"MULTIHOST_OK pid={pid} loss={loss:.5f} checksum={checksum:.3f}", flush=True)
