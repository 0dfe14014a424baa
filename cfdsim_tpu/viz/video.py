"""Frames → MP4/GIF assembly.

The reference shells out to ffmpeg (animate_cylinder.py:20-73,
video_generator.jl:32-79, libx264 MP4 + palette-optimized GIF). This rig
has no ffmpeg binary, so: MP4 via matplotlib's FFMpegWriter when ffmpeg
exists, GIF via PillowWriter always (gated fallback). fps is auto-computed
as n_frames / duration like the reference (animate_cylinder.py:33-35).
"""

from __future__ import annotations

import shutil
from pathlib import Path


def _sorted_frames(frame_dir, pattern: str = "*.png"):
    return sorted(Path(frame_dir).glob(pattern))


def make_video(
    frame_dir,
    out_path,
    duration_s: float = 10.0,
    fps: float | None = None,
    pattern: str = "*.png",
):
    """Assemble the PNGs in ``frame_dir`` into a video.

    Output format follows the ``out_path`` suffix: .mp4 needs ffmpeg
    (falls back to .gif with a warning if absent), .gif always works.
    Returns the path actually written.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt
    from PIL import Image

    frames = _sorted_frames(frame_dir, pattern)
    if not frames:
        raise FileNotFoundError(f"no frames matching {pattern} in {frame_dir}")
    if fps is None:
        fps = max(1.0, len(frames) / duration_s)

    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    want_mp4 = out.suffix.lower() == ".mp4"
    have_ffmpeg = shutil.which("ffmpeg") is not None
    if want_mp4 and not have_ffmpeg:
        out = out.with_suffix(".gif")
        want_mp4 = False

    first = Image.open(frames[0])
    dpi = 100
    fig = plt.figure(figsize=(first.width / dpi, first.height / dpi), dpi=dpi)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.axis("off")
    im = ax.imshow(first)

    def update(i):
        im.set_data(Image.open(frames[i]))
        return [im]

    anim = animation.FuncAnimation(
        fig, update, frames=len(frames), interval=1000.0 / fps, blit=True
    )
    if want_mp4:
        writer = animation.FFMpegWriter(fps=fps, codec="libx264",
                                        extra_args=["-pix_fmt", "yuv420p"])
    else:
        writer = animation.PillowWriter(fps=fps)
    anim.save(out, writer=writer)
    plt.close(fig)
    return out
