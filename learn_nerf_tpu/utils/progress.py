"""Progress bars for long host-side loops.

The reference wraps its chunked render/validation/sweep loops in tqdm
(``learn_nerf/scripts/render_nerf.py:88``, ``scripts/cv_nerf.py:85``,
``scripts/check_bbox.py:31``, ``scripts/marching_cubes.py:58``); this
helper provides the same UX with a graceful fallback if tqdm is absent.
"""

from typing import Iterable, Optional


def progress(iterable: Iterable, desc: Optional[str] = None, total=None):
    try:
        from tqdm import tqdm
    except ImportError:  # plain passthrough keeps scripts working
        return iterable
    return tqdm(iterable, desc=desc, total=total)
