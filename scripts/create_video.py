"""Create an mp4 video from a directory of rendered PNG frames.

Equivalent of ``/root/reference/scripts/utils/create_video.py`` (PNG dir ->
mp4 @ 24 fps via imageio/FFMPEG).
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--img_dir", type=str, required=True)
    parser.add_argument("--vid_title", type=str, required=True)
    parser.add_argument("--fps", type=int, default=24)
    args = parser.parse_args()

    import imageio.v2 as imageio

    files = sorted(
        os.path.join(args.img_dir, f)
        for f in os.listdir(args.img_dir)
        if f.lower().endswith(".png")
    )
    writer = imageio.get_writer(
        f"{args.vid_title}.mp4",
        format="FFMPEG",
        mode="I",
        fps=args.fps,
        macro_block_size=1,
    )
    for path in files:
        writer.append_data(imageio.imread(path))
    writer.close()
    print(f"Wrote {args.vid_title}.mp4 ({len(files)} frames).")


if __name__ == "__main__":
    main()
