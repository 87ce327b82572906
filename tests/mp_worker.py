"""Worker process for the real 2-process multi-host test (spawned by
tests/test_multiprocess.py, not collected by pytest).

Each worker owns 2 virtual CPU devices and joins a genuine
``jax.distributed`` cluster (Gloo over localhost), yielding a global
4-device ``{'data': 4}`` mesh spanning 2 processes — the same topology
as 2 TPU hosts.  It then drives the STANDARD framework surface
(``Trainer.fit`` + per-epoch validation through the Evaluator) on a
deterministic synthetic dataset and dumps the per-epoch records to
JSON.  The parent asserts the trajectories are identical across
processes AND identical to a single-process run — the deterministic
multi-host input contract (SURVEY §7 hard part 4).

Usage: python mp_worker.py <coordinator_port> <process_id> <n_processes> <out.json>
(process_id/n_processes "0 1" = single-process reference run, no
distributed init.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, nproc, out_path = sys.argv[1:5]
    pid, nproc = int(pid), int(nproc)
    n_local = 4 // nproc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert len(jax.devices()) == 4

    from datamining_recblr_tpu.config import Config
    from datamining_recblr_tpu.data.dataset import build_from_dataframe
    from datamining_recblr_tpu.data.synthetic import generate_synthetic_interactions
    from datamining_recblr_tpu.models import get_model
    from datamining_recblr_tpu.train import Trainer

    # every process builds the identical dataset from the shared seed,
    # exactly how real multi-host runs share .inter files
    df = generate_synthetic_interactions(
        n_users=120, n_items=62, min_len=8, max_len=20, markov_weight=0.9, seed=31
    )
    data = build_from_dataframe(df, max_seq_len=16)

    ckpt_root = os.path.join(os.path.dirname(os.path.abspath(out_path)),
                             f"shared_ckpt_{nproc}")

    def make_cfg(epochs):
        return Config(
            model="RecBLR",
            config_dict={
                "hidden_size": 16,
                "num_layers": 1,
                "epochs": epochs,
                "train_batch_size": 128,
                "eval_batch_size": 128,
                "use_pallas_scan": "never",
                "MAX_ITEM_LIST_LENGTH": 16,
                "dataset": "synthetic",
                # model axis: the embedding is row-sharded ACROSS the two
                # processes — collectives ride the (virtual) DCN
                "mesh_shape": {"data": 2, "model": 2},
                # toy vocab: force row-sharding (auto policy replicates)
                "vocab_row_shard": "always",
                # ONE shared checkpoint dir (derived from the common
                # parent dir, NOT the per-process out_path): orbax saves
                # are collective, each process writes its addressable
                # shards into the SAME path
                "checkpoint_dir": ckpt_root,
            },
        )

    cfg = make_cfg(epochs=3)
    model = get_model("RecBLR")(cfg, data.n_items, data.max_seq_len)
    trainer = Trainer(cfg, model)
    emb_spec = str(trainer.params["item_embedding"].sharding.spec)
    assert "model" in emb_spec, f"embedding not row-sharded: {emb_spec}"
    best, _ = trainer.fit(data, checkpoint_path=f"{ckpt_root}/m")
    records = [
        {k: rec[k] for k in ("epoch", "train_loss", "valid_score")}
        for rec in trainer.metrics.epoch_records()
    ]

    # --- save -> restart -> resume with the row-sharded embedding ------
    # partial run (2 epochs) into a second shared checkpoint, then a
    # FRESH trainer restores the sharded state collectively and finishes;
    # the resumed epochs must replay the full run's trajectory exactly
    cfg_p = make_cfg(epochs=2)
    model_p = get_model("RecBLR")(cfg_p, data.n_items, data.max_seq_len)
    tp = Trainer(cfg_p, model_p)
    tp.fit(data, checkpoint_path=f"{ckpt_root}/part")
    cfg_r = make_cfg(epochs=3)
    model_r = get_model("RecBLR")(cfg_r, data.n_items, data.max_seq_len)
    tr = Trainer(cfg_r, model_r)
    tr.resume_from(tp.ckpt_path)
    emb_spec_r = str(tr.params["item_embedding"].sharding.spec)
    assert "model" in emb_spec_r, f"restored embedding unsharded: {emb_spec_r}"
    tr.fit(data, checkpoint_path=f"{ckpt_root}/resumed")
    resumed = [
        {k: rec[k] for k in ("epoch", "train_loss", "valid_score")}
        for rec in tr.metrics.epoch_records()
    ]

    with open(out_path, "w") as f:
        json.dump(
            {"pid": pid, "best": float(best), "records": records,
             "resumed": resumed},
            f,
        )


if __name__ == "__main__":
    main()
