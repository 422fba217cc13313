"""Scale points for HITS / WARC extraction / sitemap parsing.

Same two-size (4x) protocol as web_ops_scale.py / session_ops_scale.py;
appends to BENCH_sf1.json. Aggregates run over computed columns so the
expressions under test cannot be pruned away.
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from jsonschema_spark.session import get_spark  # noqa: E402

CORES = os.environ.get("SPARK_GRAFT_CPUS", "16")
SMALL_EDGES = int(os.environ.get("CRAWL_SCALE_EDGES", "2000000"))
SMALL_DOCS = int(os.environ.get("CRAWL_SCALE_DOCS", "1000000"))


def main() -> int:
    from jsonschema_spark.operators.htmltext import charset_guess, main_content_df
    from jsonschema_spark.operators.linkgraph import host_hits_df
    from jsonschema_spark.operators.sitemap import sitemap_entries
    from jsonschema_spark.sources.warc import warc_records

    spark = get_spark("crawl_ops_scale", cores=CORES)
    results = {}

    def point(op, n, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 2)
        results.setdefault(op, []).append(
            {"n": n, "wall_s": wall, "rows_per_s": round(n / wall),
             "checksum": out})
        print(op, n, wall, "s", flush=True)

    for mult in (1, 4):
        n = SMALL_EDGES * mult
        i = F.col("id")
        edges = spark.range(0, n, numPartitions=64).select(
            F.concat(F.lit("h"), (i % 200000).cast("string")).alias("src_host"),
            F.concat(F.lit("h"), (F.abs(F.xxhash64(i, F.lit(7)))
                                  % 200000).cast("string")).alias("dst_host"),
        ).where(F.col("src_host") != F.col("dst_host"))
        point("host_hits_2it", n, lambda e=edges: [
            tuple(host_hits_df(e, n_iter=2)
                  .agg(F.count("*"), F.sum("hub_ppm"),
                       F.sum("auth_ppm")).collect()[0])])

    for mult in (1, 4):
        n = SMALL_DOCS * mult
        i = F.col("id")
        body = F.concat(F.lit("<html><body>doc "), i.cast("string"),
                        F.lit(" payload text</body></html>"))
        rec = F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
                  "https://h"), (i % 200000).cast("string"),
            F.lit(".example.org/p"), i.cast("string"),
            F.lit("\r\nContent-Length: "), F.length(body).cast("string"),
            F.lit("\r\n\r\n"), body, F.lit("\r\n\r\n"))
        files = (
            spark.range(0, n, numPartitions=64)
            .select(F.expr("id div 10").alias("file_id"),
                    F.struct(i.alias("i"), rec.alias("r")).alias("s"))
            .groupBy("file_id")
            .agg(F.concat_ws("", F.transform(
                F.array_sort(F.collect_list("s")), lambda s: s["r"]))
                .alias("warc"))
        ).localCheckpoint(eager=True)
        point("warc_records", n, lambda f=files: [
            tuple(warc_records(f, "file_id", "warc")
                  .agg(F.count("*"), F.sum("content_length"),
                       F.sum(F.length("payload"))).collect()[0])])
        files.unpersist()

    for mult in (1, 4):
        n = SMALL_DOCS * mult
        i = F.col("id")
        xml = F.concat(
            F.lit("<urlset><url><loc>https://h"), (i % 200000).cast("string"),
            F.lit(".example.org/p"), i.cast("string"),
            F.lit("</loc><priority>0."), (i % 10).cast("string"),
            F.lit("</priority></url><url><loc>https://h"),
            (i % 200000).cast("string"), F.lit(".example.org/q"),
            i.cast("string"), F.lit("</loc></url></urlset>"))
        hosts = spark.range(0, n, numPartitions=64).select(
            F.concat(F.lit("h"), (i % 200000).cast("string")).alias("host"),
            xml.alias("sitemap_xml"))
        point("sitemap_entries", n, lambda h=hosts: [
            tuple(sitemap_entries(h)
                  .agg(F.count("*"), F.sum("priority_milli"),
                       F.sum(F.length("loc"))).collect()[0])])

    for mult in (1, 4):
        n = SMALL_DOCS * mult
        i = F.col("id")
        body = F.concat_ws(" ", *[
            F.concat(F.lit("w"), (F.abs(F.xxhash64(i, F.lit(k))) % 99)
                     .cast("string")) for k in range(30)])
        html = F.concat(
            F.lit('<html><head><meta charset="utf8"><title>t</title></head>'
                  '<body><nav><a href="/">Home</a> | <a href="/a">About'
                  '</a></nav><p>'),
            body,
            F.lit('</p><div>tiny</div><footer><a href="/p">Privacy</a> '
                  '<a href="/t">Terms</a></footer></body></html>'))
        pages = spark.range(0, n, numPartitions=64).select(
            i.alias("doc_id"), F.encode(html, "UTF-8").alias("html")
        ).localCheckpoint(eager=True)
        point("main_content", n, lambda p=pages: [
            tuple(main_content_df(p)
                  .agg(F.count("*"), F.sum("n_chars"),
                       F.sum("n_blocks_kept")).collect()[0])])
        point("charset_guess", n, lambda p=pages: [
            tuple(charset_guess(p)
                  .agg(F.count("*"),
                       F.sum(F.length("charset"))).collect()[0])])
        pages.unpersist()

    out = {"stage": "crawl_ops_scale", "cores": int(CORES), "ops": {}}
    ok = True
    for op, pts in results.items():
        ratio = round(pts[1]["wall_s"] / pts[0]["wall_s"] / 4, 2)
        out["ops"][op] = {"points": pts, "wall_vs_linear_at_4x": ratio}
        ok &= ratio < 1.5
    bench_path = os.path.join(ROOT, "BENCH_sf1.json")
    doc = json.load(open(bench_path))
    doc["points"].append(out)
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
