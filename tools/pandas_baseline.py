#!/usr/bin/env python3
"""Single-node throughput reference: the same representative operations the
engine runs at sf0.1, implemented the way the reference's generated code
would run them (pandas on one process; BambooAI executes LLM-written pandas
via exec(), bambooai/code_executor.py:112-215). Prints one JSON line of
per-op wall-clock seconds for comparison against BENCH_r*.json.

Ops mirror declared queries: a1 group-multi-agg, w1 moving average,
j2 temporal join, w8 sessionize, t3 quality score, dd1 exact dedup.
Usage: python3 tools/pandas_baseline.py [sfDir]
"""
import json
import sys
import time

import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
lineitem = pd.read_parquet(f"{sfdir}/lineitem.parquet")
orders = pd.read_parquet(f"{sfdir}/orders.parquet")
events = pd.read_parquet(f"{sfdir}/events.parquet")
documents = pd.read_parquet(f"{sfdir}/documents.parquet")

out = {}


def timed(name):
    def deco(fn):
        fn()  # warm (file cache, numpy init)
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 3)
    return deco


@timed("a1_group_multi_agg")
def a1():
    g = lineitem.groupby("l_orderkey").agg(
        first_ship=("l_shipdate", "min"),
        price_max=("l_extendedprice", "max"),
        price_min=("l_extendedprice", "min"),
        avg_qty=("l_quantity", "mean"),
        total_price=("l_extendedprice", "sum"),
        max_line=("l_linenumber", "max"),
        n_lines=("l_linenumber", "size"))
    g["price_spread"] = (g.price_max - g.price_min).abs()


@timed("w1_moving_avg")
def w1():
    daily = orders.assign(day=orders.o_orderdate.dt.date) \
        .groupby("day").o_totalprice.sum().round(2).sort_index()
    daily.rolling(7, min_periods=1).mean()


@timed("j2_temporal_join")
def j2():
    o = orders.assign(day=orders.o_orderdate.dt.date) \
        .groupby("day").size().rename("n_orders").reset_index()
    l = lineitem.assign(day=lineitem.l_shipdate.dt.date) \
        .groupby("day").agg(n_ship=("l_orderkey", "size"),
                            qty_ship=("l_quantity", "sum")).reset_index()
    o.merge(l, on="day")


@timed("w8_sessionize")
def w8():
    ev = events.sort_values(["user_id", "ts", "event_id"])
    gap = ev.groupby("user_id").ts.diff().dt.total_seconds() > 1800
    ev = ev.assign(session_id=gap.groupby(ev.user_id).cumsum())
    ev.groupby(["user_id", "session_id"]).agg(
        n_events=("event_id", "size"), first=("ts", "min"), last=("ts", "max"))


@timed("t3_quality_score")
def t3():
    words = documents.text.str.split(" ")
    n_words = words.str.len()
    uniq = words.apply(lambda w: len(set(w))) / n_words
    stop = words.apply(
        lambda w: sum(x in ("the", "a", "of", "and", "to", "in", "is")
                      for x in w)) / n_words
    ((n_words / 100).clip(upper=1.0) * 0.4 + uniq * 0.3 +
     (stop * 5).clip(upper=1.0) * 0.3)


@timed("dd1_exact_dedup")
def dd1():
    corpus = pd.concat([
        documents[["doc_id", "text"]],
        documents[documents.doc_id % 17 == 0][["doc_id", "text"]]
        .assign(doc_id=lambda d: d.doc_id + 100000)])
    canonical = corpus.groupby("text").doc_id.transform("min")
    corpus.assign(canonical=canonical, is_dup=corpus.doc_id != canonical)


print(json.dumps({"metric": "pandas_baseline", "sf": sfdir, "queries": out}))
