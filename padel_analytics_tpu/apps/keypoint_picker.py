"""Standalone court-keypoint click tool (parity with /root/reference/ui.py).

Usage: python -m padel_analytics_tpu.apps.keypoint_picker <video> [out.json]
Opens the first frame in a cv2 window; left-clicks append (x, y); any key
exits and writes the JSON list.
"""

from __future__ import annotations

import json
import sys

import cv2

from ..utils.video import read_video


def pick_keypoints(img_rgb, window: str = "image") -> list[tuple[int, int]]:
    """Interactive cv2 click loop over an RGB frame: left-clicks append
    (x, y) with an on-image label; any key exits. Shared by this tool and
    the CLI's fallback keypoint acquisition (apps/cli.py)."""
    img = cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR)
    keypoints: list[tuple[int, int]] = []

    def click_event(event, x, y, flags, params):
        if event == cv2.EVENT_LBUTTONDOWN:
            keypoints.append((x, y))
            cv2.putText(
                img, f"{x},{y}", (x, y), cv2.FONT_HERSHEY_SIMPLEX, 1, (255, 0, 0), 2
            )
            cv2.imshow(window, img)

    cv2.imshow(window, img)
    cv2.setMouseCallback(window, click_event)
    cv2.waitKey(0)
    cv2.destroyAllWindows()
    return keypoints


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: keypoint_picker <video> [out.json]")
        return 2
    video_path = argv[0]
    out_path = argv[1] if len(argv) > 1 else "source_keypoints.json"

    frames, fps, w, h = read_video(video_path, max_frames=1)
    keypoints = pick_keypoints(frames[0])

    with open(out_path, "w") as f:
        json.dump(keypoints, f)
    print(f"wrote {len(keypoints)} keypoints to {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
