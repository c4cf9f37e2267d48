#!/bin/bash
# Round-5 scaling evidence driver (VERDICT r4 item 4): generate the 10x
# and 1x pair-store inputs + bucketed templates once, then run the
# bus-gated alternating N->4N pairs, 10x first (the missing evidence),
# then the same-day 1x control. Each gated_pair skips+tags degraded bus
# windows and stops at the first same-iteration pair >= 0.8.
set -ex
cd /root/repo

TEN_ENV="SCALE_MODE=pairs SCALE_HOSTS=40000 SCALE_PAGES=250 SCALE_WEB=/tmp/nr_scale10x/web"
ONE_ENV="SCALE_MODE=pairs SCALE_HOSTS=4000 SCALE_PAGES=250 SCALE_WEB=/tmp/nr_scale1x/web"

# inputs + templates (untimed setup, full cores)
[ -d /tmp/nr_scale10x/web ] || env $TEN_ENV python bench_scaling.py gen
[ -d /dev/shm/nr_tpl10x ] || env $TEN_ENV SCALE_TEMPLATE=/dev/shm/nr_tpl10x python bench_scaling.py prep
[ -d /tmp/nr_scale1x/web ] || env $ONE_ENV python bench_scaling.py gen
[ -d /dev/shm/nr_tpl1x ] || env $ONE_ENV SCALE_TEMPLATE=/dev/shm/nr_tpl1x python bench_scaling.py prep

# 10x gated pairs: up to 3 pairs in healthy windows, <= 150 min total
env $TEN_ENV SCALE_TAG=10x_r5 SCALE_LAKE_DIR=/dev/shm \
    SCALE_TEMPLATE=/dev/shm/nr_tpl10x SCALE_MAX_WALL=9000 \
    python bench_scaling.py gated_pair 2 3

# 1x same-day control: up to 2 pairs, <= 45 min
env $ONE_ENV SCALE_TAG=1x_r5 SCALE_LAKE_DIR=/dev/shm \
    SCALE_TEMPLATE=/dev/shm/nr_tpl1x SCALE_MAX_WALL=2700 \
    python bench_scaling.py gated_pair 2 2

echo "SCALING_R5_DONE"
