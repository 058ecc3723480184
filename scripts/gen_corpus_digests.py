#!/usr/bin/env python
"""Regenerate tests/golden/corpus_digests.json: SHA-256 of the FLCS bytes of
every corpus image (native backend; other backends are byte-identical, pinned
by cross-backend tests). These digests lock the encoder: any one-bit encoding
change anywhere fails tests/test_corpus.py by default.
"""

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

SUITE = "/root/reference/image-suite"
FOLDERS = ["grayscale/8bit", "grayscale/16bit", "rgb/8bit"]


def main():
    import subprocess

    subprocess.run([sys.executable, "native/build.py"], check=True)
    from felics_tpu.api import compress_image_bytes
    from felics_tpu.io.images import load_image

    digests = {}
    totals = {}
    for folder in FOLDERS:
        root = os.path.join(SUITE, folder)
        total = 0
        for name in sorted(os.listdir(root)):
            if not name.endswith((".tiff", ".tif")):
                continue
            image = load_image(os.path.join(root, name))
            data = compress_image_bytes(image, backend="native")
            digests[f"{folder}/{name}"] = {
                "sha256": hashlib.sha256(data).hexdigest(),
                "bytes": len(data),
            }
            total += len(data)
        totals[folder] = total
        print(f"{folder}: {total} bytes")
    out = os.path.join(REPO, "tests", "golden", "corpus_digests.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"totals": totals, "files": digests}, f, indent=1, sort_keys=True)
    print(f"wrote {out}: {len(digests)} files")


if __name__ == "__main__":
    main()
