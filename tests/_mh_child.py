"""Child process for the 2-process multi-host test (tests/test_multihost.py).

Usage: python tests/_mh_child.py <process_id> <coordinator_port>

Joins a 2-process jax.distributed job on the CPU backend (4 local devices
per process via XLA_FLAGS from the parent), builds the global 8-device mesh
with the production helpers, shards dataset residency over it, and runs two
fused train steps. Prints one MHRESULT line the parent asserts on.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    from mpgan_tpu.parallel import mesh as pmesh

    pmesh.init_distributed(f"127.0.0.1:{port}", 2, pid)
    assert jax.process_count() == 2

    import numpy as np

    from mpgan_tpu.config import Config, DataConfig, LossConfig, ModelConfig, \
        TrainConfig
    from mpgan_tpu.data.loader import FluidDataset
    from mpgan_tpu.data.pipeline import TileCreator
    from mpgan_tpu.train.loop import Trainer

    mesh = pmesh.make_mesh(8)

    # identical per-host data (the multi-host contract: every process loads
    # the dataset; device_put keeps only each host's addressable shards)
    rng = np.random.default_rng(7)
    n_sims, n_frames, s = 8, 3, 2
    z, y, x = 12, 16, 16
    lr = rng.random((n_sims * n_frames, z, y, x, 4), dtype=np.float32)
    hr = rng.random((n_sims * n_frames, z * s, y * s, x * s, 1),
                    dtype=np.float32)
    ds = FluidDataset(lr=lr, hr=hr, n_sims=n_sims, n_frames=n_frames,
                      up_res=s)
    tc = TileCreator(ds, tile_lr=8, density_threshold=0.0)

    cfg = Config(
        data=DataConfig(tile_size_low=8, up_res=s),
        model=ModelConfig(n_base_filters=8, n_res_blocks=1,
                          disc_base_filters=8, stages=1, dtype="float32"),
        loss=LossConfig(),
        train=TrainConfig(batch_size=8, use_temporal_disc=False,
                          training_iters=2, output_interval=1,
                          save_interval=0),
    )
    tr = Trainer(cfg, tc, mesh=mesh)
    assert tr.data_sharded, "sharded residency must engage across hosts"
    # each host must hold only its addressable half of the volume stacks
    local_vols = sum(sh.data.shape[0] for sh in tc.lr.addressable_shards)
    assert local_vols == tc.lr.shape[0] // 2, local_vols
    out = tr.fit(iters=2, log_every=1)

    # shared-filesystem checkpoint contract: every process agrees on one run
    # dir (process 0 creates it), every process calls the collective orbax
    # save (primary writes, sidecar is lead-only), everyone can restore
    from mpgan_tpu.train import checkpoint as ckpt
    base = sys.argv[3]
    run = ckpt.next_run_dir(base)
    ckpt.save(run, 0, tr.rt.state, dict(it=2, stage=1, pass_no=1))
    state, meta = ckpt.restore(run, 0, tr.rt.state)
    assert meta["it"] == 2
    leaf = np.asarray(
        jax.tree_util.tree_leaves(state.params_g)[0]).ravel()[0]

    print(f"MHRESULT {pid} {out['g_loss']:.6f} {jax.process_count()} "
          f"{os.path.basename(run)} {leaf:.6f}", flush=True)


if __name__ == "__main__":
    main()
