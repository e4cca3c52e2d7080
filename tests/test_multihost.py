"""Multi-host coordination paths, exercised with a REAL 2-process JAX
distributed CPU cluster (no fakes).

Covers what reference train.py does with torch.distributed:
* host_allreduce_sum of logging/eval scalars (dist.all_reduce,
  train.py:1136-1141,1194-1195),
* sync_global_devices around a checkpoint save (dist.barrier,
  train.py:65-71,110),
* eval piece-sharding across processes summing to the full token count
  (data_utils.py:382-391).

Each subprocess pins jax_platforms=cpu (the env var does not override the
baked default backend on this box) and joins a local coordinator.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
coordinator, num_procs, pid, out_dir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=pid)
sys.path.insert(0, %(repo)r)
import numpy as np
from transformer_gan_tpu.parallel import mesh as pmesh

assert jax.process_count() == num_procs

# --- host allreduce of logging scalars ---
local = np.asarray([float(pid + 1), 10.0 * (pid + 1)], np.float64)
reduced = pmesh.host_allreduce_sum(local)
expect = np.asarray([sum(range(1, num_procs + 1)),
                     10.0 * sum(range(1, num_procs + 1))])
np.testing.assert_allclose(reduced, expect)

# --- barrier around a rank-0 write (checkpoint-save pattern) ---
import os, time
marker = os.path.join(out_dir, "rank0_wrote")
if pid == 0:
    time.sleep(0.3)
    open(marker, "w").write("x")
pmesh.sync_global_devices("test_barrier")
assert os.path.exists(marker), "barrier released before rank 0 wrote"

# --- eval piece-sharding across processes (pure index arithmetic fed by
# process_index/process_count in the real trainer) ---
from transformer_gan_tpu.config import get_default_cfg_training
from transformer_gan_tpu.data.dataset import MusicDataset
cfg = get_default_cfg_training()
ds = MusicDataset(os.path.join(out_dir, "data"), cfg)
it = ds.eval_iterator(2, 16, split="valid",
                      local_rank=jax.process_index(),
                      world_size=jax.process_count())
tok = sum(b[3] for b in it())
total = pmesh.host_allreduce_sum(np.asarray([tok], np.float64))
assert int(total[0]) == int((ds.valid_seq_length - 1).sum()), (
    int(total[0]), int((ds.valid_seq_length - 1).sum()))

print("WORKER_OK", pid)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_cpu():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as out_dir:
        # tiny dataset for the sharded-eval leg
        from transformer_gan_tpu.data.codec import build_performance_vocab
        rng = np.random.RandomState(3)
        data_dir = os.path.join(out_dir, "data")
        os.makedirs(data_dir)
        with open(os.path.join(data_dir, "vocab.txt"), "w") as f:
            f.write("\n".join(build_performance_vocab()))
        for split in ("train", "valid", "test"):
            os.makedirs(os.path.join(data_dir, split))
            for i in range(7):
                arr = rng.randint(2, 310, size=(rng.randint(40, 200),)
                                  ).astype(np.int32)
                np.save(os.path.join(data_dir, split, f"p{i}.npy"), arr)

        script = os.path.join(out_dir, "worker.py")
        with open(script, "w") as f:
            f.write(_WORKER % {"repo": repo})

        coord = f"127.0.0.1:{_free_port()}"
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # one device per process
        procs = [
            subprocess.Popen(
                [sys.executable, script, coord, "2", str(pid), out_dir],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for pid in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode())
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"rank {pid} failed:\n{out}"
            assert f"WORKER_OK {pid}" in out
