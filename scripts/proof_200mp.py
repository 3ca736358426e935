"""Max-preset proof run: 200MP target at 16-bit on the real chip.

VERDICT r2 item 6: exercise the int64-cursor/4GB guard and the banded
save at the largest preset (reference presets: main.py:171-175; 200MP +
16-bit = ~1.2 GB TIFF) and verify the output without loading it — the
TIFF header is parsed directly (tifffile isn't in this image and a full
imread of 200MP x uint16 would double host RSS for nothing).

    python scripts/proof_200mp.py [--out /tmp/proof200]
"""

import argparse
import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiff_header_info(path):
    """(width, height, bits_per_sample, strip_count) from the first IFD.

    Minimal TIFF reader: classic (42) little/big endian, enough tags to
    verify the native writer's output (ops parity: native/tiffio.cpp)."""
    with open(path, "rb") as f:
        head = f.read(8)
        bo = "<" if head[:2] == b"II" else ">"
        magic, off = struct.unpack(bo + "HI", head[2:8])
        assert magic == 42, f"not a classic TIFF (magic={magic})"
        f.seek(off)
        (n,) = struct.unpack(bo + "H", f.read(2))
        tags = {}
        for _ in range(n):
            tag, typ, cnt, val = struct.unpack(bo + "HHII", f.read(12))
            tags[tag] = (typ, cnt, val)

        def short_values(entry):
            typ, cnt, val = entry
            if cnt == 1:
                return [val & 0xFFFF] if typ == 3 else [val]
            if typ == 3 and cnt == 2:  # two SHORTs packed inline
                return [val & 0xFFFF, val >> 16]
            f.seek(val)  # val is an offset
            fmt = {3: "H", 4: "I"}[typ]
            raw = f.read(cnt * struct.calcsize(fmt))
            return list(struct.unpack(bo + fmt * cnt, raw))

        width = tags[256][2]
        height = tags[257][2]
        bits = short_values(tags[258])[0] if 258 in tags else 8
        strips = tags.get(273, (0, 0, 0))[1]
    return width, height, bits, strips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/proof200")
    ap.add_argument("--target", default="200MP")
    ap.add_argument("--bit-depth", type=int, default=16)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import numpy as np

    from srs_tpu.models.corpus import render_photo
    from srs_tpu.pipeline import PipelineConfig, SuperResolutionPipeline

    # natural-statistics 720p input (bench parity)
    import cv2

    scene = render_photo(42, 768)
    inp = cv2.resize(scene, (1280, 720), interpolation=cv2.INTER_AREA)
    in_path = os.path.join(args.out, "in.png")
    cv2.imwrite(in_path, cv2.cvtColor(inp.astype(np.uint8), cv2.COLOR_RGB2BGR))

    out_path = os.path.join(args.out, f"out_{args.target}_{args.bit_depth}b.tiff")
    cfg = PipelineConfig(
        target_resolution=args.target, bit_depth=args.bit_depth, enable_qa=True
    )
    pipe = SuperResolutionPipeline(cfg)
    t0 = time.time()
    res = pipe.process(in_path, out_path)
    elapsed = time.time() - t0
    assert res.success, res.error_message

    size = os.path.getsize(out_path)
    w, h, bits, strips = tiff_header_info(out_path)
    mp = w * h / 1e6
    expected = w * h * 3 * (args.bit_depth // 8)
    report = {
        "target": args.target,
        "bit_depth": args.bit_depth,
        "output": out_path,
        "file_bytes": size,
        "file_gb": round(size / 1e9, 3),
        "width": w,
        "height": h,
        "mp": round(mp, 1),
        "bits_tag": bits,
        "strip_count": strips,
        "pixel_bytes_expected": expected,
        "header_ok": bool(w > 0 and h > 0 and size >= expected),
        "elapsed_s": round(elapsed, 1),
        "stage_times": {k: round(v, 2) for k, v in res.stage_times.items()},
        "quality_score": res.quality_score,
    }
    print(json.dumps(report))
    assert report["header_ok"], report
    print("PROOF OK", flush=True)


if __name__ == "__main__":
    main()
