"""Training metric logging.

Emits the reference's stdout line format ``step {i}: k=v ...``
(``learn_nerf/scripts/train_nerf.py:130-131``) so ``plot_log`` keeps
working, and adds a throughput counter (rays/sec) the reference lacks
(SURVEY.md section 5).
"""

import sys
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, rays_per_step: Optional[int] = None, out=None):
        self.rays_per_step = rays_per_step
        self.out = out if out is not None else sys.stdout
        self._last_time: Optional[float] = None
        self._ema_rate: Optional[float] = None

    def log_step(self, step: int, values: Dict[str, object]) -> None:
        parts = [f"{k}={float(v):.05}" for k, v in values.items()]
        now = time.monotonic()
        if self.rays_per_step is not None and self._last_time is not None:
            dt = now - self._last_time
            if dt > 0:
                rate = self.rays_per_step / dt
                self._ema_rate = (
                    rate
                    if self._ema_rate is None
                    else 0.9 * self._ema_rate + 0.1 * rate
                )
                parts.append(f"rays_per_sec={self._ema_rate:.05}")
        self._last_time = now
        print(f"step {step}: {' '.join(parts)}", file=self.out, flush=True)
