"""Two-stage out-of-core ray shuffle, generalized to multi-host.

Algorithm parity with the reference (``learn_nerf/dataset.py:162-263``,
the Jane Street two-stage shuffle): rays are first scattered at random into
``num_shards`` raw float32 files (reusable across runs via a ``done``
marker), then each epoch permutes the shard order and the rows within each
shard, concatenating remainders across shard boundaries.

Multi-host generalization (the reference is single-process): each process
owns the views with ``index % process_count == process_id`` and writes its
shards under ``host_{process_id}/``, so every host streams a disjoint ray
subset with no cross-host I/O — the per-host batches then join into one
globally-sharded array at the jit boundary
(``parallel.mesh.global_batch_from_local``).
"""

import os
from typing import Iterator, Optional

import numpy as np

ROW_SHAPE = (3, 3)
ROW_FLOATS = 9


class ShuffledDataset:
    def __init__(
        self,
        dir_path: str,
        dataset,
        seed: int,
        num_shards: int = 32,
        process_id: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        if process_id is None:
            try:
                import jax

                process_id = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_id, process_count = 0, 1
        self.num_shards = num_shards
        rng = np.random.Generator(np.random.Philox(seed))
        self._shard_rng, self._shuffle_rng = rng.spawn(2)

        host_dir = (
            os.path.join(dir_path, f"host_{process_id}")
            if process_count > 1
            else dir_path
        )
        os.makedirs(host_dir, exist_ok=True)
        done_path = os.path.join(host_dir, "done")
        paths = [os.path.join(host_dir, str(i)) for i in range(num_shards)]
        if os.path.exists(done_path):
            self.fds = [open(p, "rb") for p in paths]
        else:
            self.fds = [open(p, "wb+") for p in paths]
            local_views = dataset.views[process_id::max(process_count, 1)]
            self._create_shards(local_views)
            with open(done_path, "wb") as f:
                f.write(b"done\n")

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    def close(self):
        for fd in self.fds:
            fd.close()

    def iterate_batches(
        self, batch_size: int, repeat: bool = False
    ) -> Iterator[np.ndarray]:
        """Yield shuffled ``[batch_size, 3, 3]`` batches.

        With ``repeat=False`` the final batch may be short; with
        ``repeat=True`` the stream re-permutes every epoch forever.
        """
        rng = self._shuffle_rng
        carry = None
        while True:
            for shard in rng.permutation(self.num_shards):
                rows = self._read_shard(int(shard))
                rows = rows[rng.permutation(rows.shape[0])]
                carry = rows if carry is None else np.concatenate([carry, rows])
                while carry.shape[0] >= batch_size:
                    yield carry[:batch_size]
                    carry = carry[batch_size:]
            if not repeat:
                break
        if carry is not None and carry.shape[0]:
            yield carry

    def _create_shards(self, views) -> None:
        for view in views:
            rays = np.asarray(view.rays(), dtype=np.float32)
            assignments = self._shard_rng.integers(0, self.num_shards, rays.shape[0])
            order = np.argsort(assignments, kind="stable")
            sorted_rays = rays[order]
            counts = np.bincount(assignments, minlength=self.num_shards)
            offset = 0
            for shard, count in enumerate(counts):
                if count:
                    self.fds[shard].write(sorted_rays[offset : offset + count].tobytes())
                offset += count

    def _read_shard(self, shard: int) -> np.ndarray:
        f = self.fds[shard]
        f.seek(0)
        data = f.read()
        return np.frombuffer(data, dtype=np.float32).reshape(-1, *ROW_SHAPE).copy()
