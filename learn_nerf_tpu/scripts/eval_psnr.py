"""Evaluate a trained model: render every view of a dataset and report PSNR.

No reference counterpart (the reference only logs MSE losses); this is the
measurement tool behind BASELINE.md's "matched PSNR" comparisons.  Prints
per-view and mean PSNR in dB over u8 pixels, plus a final summary line
``mean_psnr=<dB>`` for scripting.
"""

import os

import numpy as np

from ..data.dataset import load_dataset
from .render_nerf import RenderSession, base_argparser


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean())
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def main(argv=None):
    parser = base_argparser()
    parser.add_argument(
        "--max_views", type=int, default=None, help="evaluate only the first N views"
    )
    parser.add_argument("data_dir", type=str)
    args = parser.parse_args(argv)
    # RenderSession wants metadata_json; point it into the dataset dir.
    args.metadata_json = os.path.join(args.data_dir, "metadata.json")

    data = load_dataset(args.data_dir)
    views = (
        data.views[: args.max_views] if args.max_views is not None else data.views
    )

    from ..utils.progress import progress

    session = RenderSession(args)
    scores = []
    for i, view in enumerate(progress(views, desc="views")):
        gt = view.image()
        # Explicit per-view resolution: the jitted frame fn caches one
        # executable per distinct ray count, so mixed-resolution datasets
        # compile once per resolution, not per view.
        pred = session.render_view(view, width=gt.shape[1], height=gt.shape[0])
        session.images.clear()
        score = psnr(pred, gt)
        scores.append(score)
        print(f"view {i}: psnr={score:.2f} dB", flush=True)

    print(f"mean_psnr={np.mean(scores):.3f}")


if __name__ == "__main__":
    main()
