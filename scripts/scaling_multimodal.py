"""Multimodal decode throughput (r10): the three Arrow-batched header
decoders (image 5-format cycle, audio WAV/RIFF, video MP4) at 1x/10x/
100x asset counts. These are map-only passes — no shuffle at all — so
the leg pins LINEAR wall growth and the per-asset decode cost of the
pure-Python parsers inside mapInPandas (the seam a real CLIP/wav2vec/
ffprobe batch would occupy). Measured with the noop sink (a .count()
would prune nothing here, but keep the convention).

Run:  python scripts/scaling_multimodal.py [--scales=1,10,100]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opensea_datapipeline_spark.operators import multimodal as mm  # noqa: E402
from opensea_datapipeline_spark.session import get_spark  # noqa: E402

BASE = 5_000
DECODERS = {
    "image": (mm.synthesize_image_payloads, mm.decode_media),
    "audio": (mm.synthesize_audio_payloads, mm.decode_audio),
    "video": (mm.synthesize_video_payloads, mm.decode_video),
}


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark("scaling-multimodal")
    spark.sparkContext.setLogLevel("ERROR")
    legs = []
    for mult in scales:
        n = BASE * mult
        ids = spark.range(n).select(F.col("id").alias("doc_id")).repartition(32)
        row = {"mult": mult, "n_assets": n}
        for tag, (synth, decode) in DECODERS.items():
            payloads = synth(ids, "doc_id").persist()
            payloads.count()  # materialize input so we time DECODE only
            walls = []
            for _ in range(2):
                t0 = time.time()
                decode(payloads, "media", "asset_id").write.mode(
                    "overwrite"
                ).format("noop").save()
                walls.append(time.time() - t0)
            payloads.unpersist()
            w = min(walls)
            row[tag] = {
                "wall_s": round(w, 3),
                "assets_per_s": int(n / w) if w else None,
            }
        legs.append(row)
        print(json.dumps(row))
    print(json.dumps({"legs": legs}))


if __name__ == "__main__":
    main()
