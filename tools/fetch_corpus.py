"""Corpus fetcher (reference ``yt-downloader.py`` role).

Downloads best-quality videos into ``videos/`` via yt-dlp for the batch
harness.  Gated on yt-dlp availability (not bundled in this image); reads
URLs from the command line or a manifest file (one URL per line, optional
``<label> <url>`` form like the reference's ``test_videos.txt``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fvd_tpu.providers.media import Downloader


def parse_manifest(path: str):
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) >= 2 and parts[0] in ("0", "1"):
                entries.append((int(parts[0]), parts[1]))
            else:
                entries.append((None, parts[0]))
    return entries


def main() -> int:
    ap = argparse.ArgumentParser(description="Download evaluation corpus videos")
    ap.add_argument("urls", nargs="*", help="video URLs")
    ap.add_argument("--manifest", help="file with one URL (or '<label> <url>') per line")
    ap.add_argument("--out-dir", default="videos")
    args = ap.parse_args()

    entries = [(None, u) for u in args.urls]
    if args.manifest:
        entries += parse_manifest(args.manifest)
    if not entries:
        ap.error("no URLs given")

    dl = Downloader()
    if not dl.available:
        print("yt-dlp is not installed in this environment; cannot download.")
        return 1

    os.makedirs(args.out_dir, exist_ok=True)
    failures = 0
    for label, url in entries:
        print(f"Downloading {url} ...")
        try:
            path, meta = dl.download(url, args.out_dir)
            title = (meta.get("title") or "video").replace("/", "_")
            prefix = {1: "deepfake_", 0: ""}.get(label, "")
            dest = os.path.join(args.out_dir, f"{prefix}{title}.mp4")
            if os.path.abspath(path) != os.path.abspath(dest):
                os.replace(path, dest)
            print(f"  -> {dest}")
        except Exception as e:
            print(f"  FAILED: {e}")
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
