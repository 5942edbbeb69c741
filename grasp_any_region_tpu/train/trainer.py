"""Training orchestration: the loop that replaces mmengine Runner + xtuner.

Capabilities mirrored from the reference harness (SURVEY.md §3.1):
  * 1-epoch (or step-capped) loop over GraspAnyRegionDataset
  * length-grouped shuffling, per-device batch, grad accumulation
  * warmup+cosine schedule, grad clip, bf16 (no loss scaling on TPU)
  * iter timing + loss logging every N steps (IterTimer/LoggerHook)
  * periodic orbax checkpoints, keep-K, resume
  * final HF-format export

Distribution: pjit over the (data, fsdp, tensor, seq) mesh instead of
DDP+ZeRO-2+torchrun; host data loading feeds shard_batch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax

from ..core.config import GARConfig
from ..core.mesh import MeshSpec, make_mesh
from ..data.builders import collate_samples
from ..data.loader import PrefetchLoader
from ..data.dataset import DatasetConfig, GraspAnyRegionDataset, length_grouped_indices
from ..data.tokenizer import GARTokenizer
from .checkpoints import CheckpointManager
from .optimizer import OptimizerConfig
from .step import init_sharded_state, make_train_step, shard_batch


@dataclass
class TrainerConfig:
    work_dir: str = "./work_dirs/gar"
    max_steps: Optional[int] = None  # None = 1 epoch
    batch_size: int = 1  # per step (global)
    log_interval: int = 100  # LoggerHook(interval=100)
    save_interval: int = 5000  # CheckpointHook(interval=5000)
    max_keep_ckpts: int = 2
    save_optimizer: bool = True
    seed: int = 42
    mesh: Optional[MeshSpec] = None
    resume: bool = True
    # host pipeline (reference: torch DataLoader num_workers=4,
    # configs/gar_1b.py:110-120); threads overlap because the hot per-sample
    # work (native RLE decode, native bicubic resize) releases the GIL
    num_workers: int = 4
    prefetch_batches: int = 2
    # "gpipe" differentiates through the schedule (activation memory grows
    # with n_micro); "1f1b" interleaves each microbatch's backward
    # (O(pipe) activations, same bubble — parallel/pipeline.py)
    pipe_schedule: str = "gpipe"


class Trainer:
    def __init__(
        self,
        cfg: GARConfig,
        params,
        dataset: GraspAnyRegionDataset,
        opt_cfg: OptimizerConfig,
        tcfg: TrainerConfig,
    ):
        self.cfg = cfg
        self.dataset = dataset
        self.tcfg = tcfg
        self.mesh = make_mesh(tcfg.mesh) if tcfg.mesh else None
        if self.mesh is not None:
            dp = tcfg.mesh.data * tcfg.mesh.fsdp
            if tcfg.batch_size % dp != 0:
                raise ValueError(
                    f"batch_size {tcfg.batch_size} must be divisible by "
                    f"data*fsdp = {tcfg.mesh.data}*{tcfg.mesh.fsdp} = {dp} "
                    "(the batch axis shards over both)"
                )
        self.state, self.tx = init_sharded_state(params, opt_cfg, mesh=self.mesh)
        self.step_fn = make_train_step(cfg, self.tx, mesh=self.mesh,
                                pipe_schedule=tcfg.pipe_schedule)
        # sequence parallelism: collate pads S to a multiple of the seq axis
        # (the reference's pad_for_sequence_parallel, custom_collect_fn.py:89-94)
        self.seq_multiple = tcfg.mesh.seq if tcfg.mesh else 1
        # multi-host: each process loads only its slice of every step's batch
        # and must emit identical static shapes (shard_batch assembles the
        # global array from per-process shards)
        self.n_procs = jax.process_count()
        self.proc_id = jax.process_index()
        if self.n_procs > 1:
            if tcfg.batch_size % self.n_procs:
                raise ValueError(
                    f"batch_size {tcfg.batch_size} must divide over "
                    f"{self.n_procs} processes"
                )
            self.pad_to_len = dataset.ds_cfg.max_length
            if self.pad_to_len % max(1, self.seq_multiple):
                m = self.seq_multiple
                self.pad_to_len += m - self.pad_to_len % m
        else:
            self.pad_to_len = None
        self.ckpt = CheckpointManager(
            tcfg.work_dir,
            save_interval=tcfg.save_interval,
            max_to_keep=tcfg.max_keep_ckpts,
            save_optimizer=tcfg.save_optimizer,
        )
        if tcfg.resume:
            restored = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored
                print(f"[trainer] resumed from step {int(self.state.step)}")

    def _epoch_indices(self, rng: np.random.Generator) -> np.ndarray:
        lengths = self.dataset.modality_lengths()
        return length_grouped_indices(lengths, self.tcfg.batch_size, rng)

    def train(self):
        t = self.tcfg
        n_items = len(self.dataset)
        steps_per_epoch = max(1, n_items // t.batch_size)
        max_steps = t.max_steps or steps_per_epoch
        start_step = int(self.state.step)

        # Whole-epoch partition (fixes the round-1 overlapping-window bug):
        # each epoch draws a fresh deterministic permutation keyed by
        # (seed, epoch) — resume past an epoch boundary reshuffles instead of
        # re-sampling a stale window (reference: DistSamplerSeedHook,
        # configs/gar_1b.py:186). Tail items (n % batch) are dropped, the
        # standard drop_last partition.
        order_cache: dict[int, np.ndarray] = {}

        def order_for(epoch: int) -> np.ndarray:
            if epoch not in order_cache:
                order_cache.clear()  # only the current epoch is ever needed
                order_cache[epoch] = self._epoch_indices(
                    np.random.default_rng([t.seed, epoch])
                )
            return order_cache[epoch]

        # materialize the exact per-step index sequence, then prefetch it on
        # a thread pool (data/loader.py) so sample building overlaps the
        # device step. Multi-host: this process takes rows
        # [proc_id*local_bs, (proc_id+1)*local_bs) of every step's batch.
        local_bs = t.batch_size // self.n_procs
        row0 = self.proc_id * local_bs
        step_indices = []
        for step in range(start_step, max_steps):
            epoch, pos = divmod(step, steps_per_epoch)
            order = order_for(epoch)
            lo = pos * t.batch_size + row0
            # modulo only bites in the degenerate n_items < batch_size case
            step_indices.extend(
                int(order[(lo + k) % len(order)]) for k in range(local_bs)
            )
        loader = PrefetchLoader(
            self.dataset, step_indices, batch_size=local_bs,
            collate_fn=lambda xs: collate_samples(
                self.cfg, xs, with_labels=True, seq_multiple=self.seq_multiple,
                pad_to_len=self.pad_to_len,
            ),
            num_workers=max(1, t.num_workers),
            prefetch_batches=max(1, t.prefetch_batches),
        )

        it_times = []
        t_last = time.time()
        for step, (batch, _, labels) in zip(range(start_step, max_steps), loader):
            if self.mesh is not None:
                batch, labels = shard_batch(batch, labels, self.mesh)
            self.state, metrics = self.step_fn(self.state, batch, labels)

            it_times.append(time.time() - t_last)
            t_last = time.time()
            if (
                (step + 1) % t.log_interval == 0
                or step == start_step
                or step + 1 == max_steps
            ):
                loss = float(metrics["loss"])
                gnorm = float(metrics["grad_norm"])
                print(
                    f"[trainer] step {step + 1}/{max_steps} "
                    f"loss {loss:.4f} grad_norm {gnorm:.3f} "
                    f"iter {np.mean(it_times[-t.log_interval:]):.2f}s"
                )
            self.ckpt.maybe_save(step + 1, self.state)
        # final state always hits disk (resume/export), whatever the cadence
        self.ckpt.maybe_save(max_steps, self.state, force=True)
        self.ckpt.wait()
        return self.state
