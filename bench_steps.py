#!/usr/bin/env python
"""Per-step timing of one colocated drain (BENCH/BASELINE.md §5).

Round 2's step table had a ~5-10 s/round DRIVER-SERIAL line: building
the broadcast hash relation for the fetch/verdict joins. The colocated
layout (store+schedule bucketed on url_hash) removes that join build
entirely — each round is two jobs, both fully parallel:

  1. cache write  = pruned schedule read → exchange-free sort-merge
     fetch join → inline Arrow-batched image decode+validate → slice
     write (row count via observe)
  2. metrics      = column-pruned per-host aggregate of the slice

This measures exactly those two jobs per round, at the scaling-harness
input (SCALE_WEB, default the 1M-URL pair store), 32 cores, and writes
BENCH/steps_colocated.json. There is no driver-serial step left to
time: between job 1 and job 2 the driver only issues the next action.

    python bench_steps.py            # reuses $SCALE_WEB if materialized
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

WEB_PATH = os.environ.get("SCALE_WEB", "/tmp/nr_scale_input/web")
N_HOSTS = int(os.environ.get("SCALE_HOSTS", "4000"))
PAGES = int(os.environ.get("SCALE_PAGES", "250"))
CORES = int(os.environ.get("STEP_CORES", "32"))
N_BUCKETS = int(os.environ.get("SCALE_BUCKETS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from netrunner_spark.plans.crawl import CrawlConfig, CrawlJob
    from netrunner_spark.session import get_spark
    from netrunner_spark.sources.fetcher import prepare_colocated_fetcher
    from netrunner_spark.synth import gen_images, gen_pair_web, gen_robots
    from netrunner_spark.tables import LakeCatalog
    from netrunner_spark.urlnorm import url_hash_col

    spark = get_spark(f"steps_{CORES}", master=f"local[{CORES}]")
    if os.path.isdir(WEB_PATH):
        web = spark.read.parquet(WEB_PATH)
        images = spark.read.parquet(WEB_PATH + "_images")
        corpus_source = WEB_PATH
    else:
        web = gen_pair_web(spark, N_HOSTS, PAGES)
        images = gen_images(spark, N_HOSTS, PAGES, dense=True)
        corpus_source = f"inline pair-store {N_HOSTS}x{PAGES}"
    # provenance sniff: a reused $SCALE_WEB may hold bench_scaling's
    # default html-mode corpus (~12 KB pages, sparse images), not the
    # dense pair store this bench describes — record the shape so the
    # JSON can't silently claim the wrong workload (r5 review)
    shape = web.agg(
        F.count(F.lit(1)).alias("rows"),
        F.avg(F.length("content")).alias("avg_len"),
        F.avg(F.col("image_id").isNotNull().cast("int")).alias("img_frac"),
    ).collect()[0]
    corpus = {
        "source": corpus_source,
        "rows": int(shape["rows"]),
        "avg_content_bytes": round(float(shape["avg_len"] or 0), 1),
        "image_coverage_permille": int(round(1000 * float(shape["img_frac"] or 0))),
    }
    corpus["looks_like_pair_store"] = (
        corpus["avg_content_bytes"] < 1000
        and corpus["image_coverage_permille"] == 1000
    )
    print(json.dumps({"corpus": corpus}))
    robots = gen_robots(spark, N_HOSTS).withColumn(
        "crawl_delay", F.lit(None).cast("double")
    )
    frontier0 = web.select("url", "host", url_hash_col("url").alias("url_hash"))

    tmp = tempfile.mkdtemp(prefix="nr_steps_", dir=os.environ.get("SCALE_LAKE_DIR"))
    try:
        cat = LakeCatalog(spark, tmp)
        cfg = CrawlConfig(
            rps=2.0,
            round_seconds=PAGES / 6.0,
            max_rounds=50,
            colocated_buckets=N_BUCKETS,
        )
        fetcher = prepare_colocated_fetcher(cat, web, images, n_buckets=N_BUCKETS)
        job = CrawlJob(spark, cat, fetcher, robots, cfg)
        t = time.time()
        job.init_frontier(frontier0)
        t_init = time.time() - t

        rounds = []
        r = 0
        while r <= job.max_round():
            from pyspark.sql import Observation

            t = time.time()
            batch = job._round_batch(r)
            if batch is None:
                break
            from netrunner_spark.plans.crawl import CACHE_COLS

            obs = Observation()
            # identical projection to run_round's cache write — the
            # timed job must be the same physical plan the drain runs
            small = job._batch_bytes(r) < cfg.colocated_broadcast_bytes
            fetched = (
                job.fetcher.fetch(batch, prefer_broadcast=small)
                .select(*(CACHE_COLS + ["image_ok", "image_phash"]))
                .observe(obs, F.count(F.lit(1)).alias("n"))
            )
            t_plan = time.time() - t  # pure driver-side plan construction
            t = time.time()
            cat.write_slice(
                fetched.withColumn("fetched_round", F.lit(r)),
                "cache",
                "fetched_round",
                r,
            )
            t_cache = time.time() - t
            n = int(obs.get["n"])

            t = time.time()
            job._write_metrics(r)
            t_metrics = time.time() - t
            rounds.append(
                {
                    "round": r,
                    "urls": n,
                    "plan_build_s": round(t_plan, 3),
                    "fetch_join_validate_cache_s": round(t_cache, 3),
                    "metrics_s": round(t_metrics, 3),
                }
            )
            print(json.dumps(rounds[-1]))
            r += 1

        out = {
            "cores": CORES,
            "buckets": N_BUCKETS,
            "corpus": corpus,
            "input_urls": int(sum(x["urls"] for x in rounds)),
            "init_schedule_s": round(t_init, 3),
            "rounds": rounds,
            "driver_serial_join_build_s": 0.0,
            "note": "colocated mode: no broadcast hash-relation build exists; "
            "plan_build_s is the only driver-side time between jobs",
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "steps_colocated.json"), "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
