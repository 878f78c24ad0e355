"""Worker for the multi-process distributed test (tests/test_multiprocess.py).

Runs one real training batch through the Trainer — image path and
feature-bank path — under jax.distributed with 2 virtual CPU devices per
process, and prints the step metrics for the parent to compare against a
single-process run over the same logical global batch.

Parameterized over the process count H (VERDICT r3 next #5): H=2 catches
interleaving bugs, H=4 is the first count where host-stripe contiguity /
per-host offset arithmetic (Trainer._host_rows, eval finish) can diverge
from interleaving bugs — modular-arithmetic mistakes that pass at H=2.

Usage: python _mp_worker.py <data_root> <mode> [<port> <process_id> <H>]
  mode = "multi" (H processes x 2 devices, local batch 8/H)
       | "single" (1 process x 2 devices, batch 8)
"""

import os
import sys


def main():
    data_root, mode = sys.argv[1], sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    nproc = 1
    if mode == "multi":
        port, pid = sys.argv[3], int(sys.argv[4])
        nproc = int(sys.argv[5]) if len(sys.argv) > 5 else 2
        jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                                   process_id=pid)

    from sat_tpu.config import Config
    from sat_tpu.engine.loop import Trainer

    local_bs = 8 // nproc if mode == "multi" else 8

    for tag, cache in (("IMGPATH", False), ("BANK", True)):
        # Dropout draws depend on the row ORDER of the global batch, which
        # striping permutes; disable it (Config.dropout_rate plumb, round 4)
        # so single- vs multi-process runs are comparable — the optimization
        # math is what's under test.
        cfg = Config(data=data_root, network="vgg19", image_size=32,
                     batch_size=local_bs, epochs=1, tf=True, attention=True,
                     log_interval=100, perform_test=False, dropout_rate=0.0,
                     checkpoint_dir=data_root + f"/ckpt_{tag}_{mode}",
                     cache_features=cache)
        tr = Trainer(cfg)
        imgs, caps, _, idxs = next(iter(tr.train_loader.epoch(1)))
        rng = jax.random.fold_in(tr.dropout_rng, 0)
        tr.state, metrics = tr._run_train_step("train", imgs, caps, idxs,
                                               1e-4, rng)
        print(f"{tag}_METRICS {float(metrics['loss']):.6f} "
              f"{float(metrics['acc1']):.5f} {float(metrics['acc5']):.5f} "
              f"{int(metrics['caption_length'])}", flush=True)

        # Eval path over the same process_count>1 assembly: metrics are
        # global means (must match exactly); argmax tokens come back
        # batch-sharded, so _host_read's replicated reshard (XLA cross-host
        # all-gather) is what this exercises. Each host prints
        # (dataset_row -> token row) pairs for ITS stripe of the global
        # batch; the parent compares the union against single-process.
        v_imgs, v_caps, _, v_idxs = next(iter(tr.val_loader.epoch(0)))
        ev_metrics, pred_tokens, _ = tr._run_eval_step("val", v_imgs, v_caps,
                                                       v_idxs)
        local_n = len(v_idxs)
        # _host_rows slices by the PADDED stripe width (offset by local_n
        # alone would land on another host's _pad_batch padding rows).
        mine = tr._host_rows(tr._host_read(pred_tokens), local_n)
        pairs = ";".join(
            f"{int(v_idxs[k])}:" + "|".join(str(t) for t in
                                            mine[k].tolist())
            for k in range(local_n))
        print(f"{tag}_EVAL {float(ev_metrics['loss']):.6f} "
              f"{float(ev_metrics['acc1']):.5f} "
              f"{int(ev_metrics['caption_length'])} PAIRS {pairs}",
              flush=True)

        # Full run_evaluation: exercises _host_read + _host_rows (stripe
        # slicing of gathered tokens) end-to-end, incl. decode/BLEU over
        # this host's stripe. Global loss must match single-process.
        result = tr.validate(0)
        print(f"{tag}_VAL {result['loss']:.6f} {result['bleu1']:.6f}",
              flush=True)

    if mode == "multi":
        # Coordinated preemption (ADVICE r2 medium): deliver the preempt
        # request to process 0 ONLY. _preempt_coordinated must global-OR the
        # flag so BOTH processes enter the (collective) mid-epoch Orbax save
        # at the same batch index — an uncoordinated flag deadlocks here.
        from sat_tpu.engine import checkpoint as ckpt
        from sat_tpu.engine.loop import TrainingPreempted
        cfg = Config(data=data_root, network="vgg19", image_size=32,
                     batch_size=local_bs, epochs=1, tf=True, attention=True,
                     log_interval=100, perform_test=False, dropout_rate=0.0,
                     checkpoint_dir=data_root + "/ckpt_preempt",
                     cache_features=True)
        tr = Trainer(cfg)
        if jax.process_index() == 0:
            tr.request_preempt()
        try:
            tr.train_epoch(1)
            print("PREEMPT_NONE", flush=True)
        except TrainingPreempted:
            step = ckpt.latest_train_state_step(cfg.checkpoint_dir)
            restored = ckpt.restore_train_state(
                cfg.checkpoint_dir, step,
                {"state": tr.state, "epoch": 0, "batch_offset": 0})
            print(f"PREEMPT_OFFSET {int(restored['epoch'])} "
                  f"{int(restored['batch_offset'])}", flush=True)

        # Blocked dispatch under 2 processes (--steps-per-dispatch):
        # exercises _put_indices_block's make_array_from_process_local_data
        # branch (the (K, B) global block assembly) and blocked
        # validation's bulk stacked gathers — must be BIT-identical to
        # per-batch dispatch on the same global mesh. 16 train rows /
        # global batch 8 -> 2 batches -> one K=2 block, no tail
        # (per host: 16/H rows at local batch 8/H, any H).
        import numpy as np
        results = {}
        for K in (1, 2):
            cfg = Config(data=data_root, network="vgg19", image_size=32,
                         batch_size=local_bs, epochs=1, tf=True,
                         attention=True, log_interval=100,
                         perform_test=False, dropout_rate=0.0,
                         checkpoint_dir=data_root + f"/ckpt_blk{K}",
                         cache_features=True, steps_per_dispatch=K)
            tr = Trainer(cfg)
            assert (tr.train_block is not None) == (K > 1)
            assert (tr.eval_block is not None) == (K > 1)
            tr.train_epoch(1)
            params = jax.tree_util.tree_map(
                lambda x: np.asarray(tr._host_read(x)), tr.state.params)
            results[K] = (params, int(tr.state.step), tr.validate(0))
        assert results[1][1] == results[2][1] == 2
        for a, b in zip(jax.tree_util.tree_leaves(results[1][0]),
                        jax.tree_util.tree_leaves(results[2][0])):
            np.testing.assert_array_equal(a, b)
        print("BLOCKED_TRAIN_OK", flush=True)
        assert results[1][2] == results[2][2], (results[1][2],
                                                results[2][2])
        print("BLOCKED_VAL_OK", flush=True)


if __name__ == "__main__":
    main()
