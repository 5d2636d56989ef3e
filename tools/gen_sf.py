#!/usr/bin/env python3
"""Synthesize a larger scale factor of the driver's test tables.

Mirrors the observed sf0.1 schemas and distributions (word-salad
documents with exact/near duplicates, unit-norm 64-dim embeddings with
random labels, 30-day microsecond event stream, TPC-H-ish relational
tables) so bench runs at sf1+ exercise the same plan shapes. Values are
NOT oracle-checked at generated SFs — this exists to expose shuffle-size
cliffs the 17 MB sf0.1 cannot.

Usage: gen_sf.py OUT_DIR SCALE   (SCALE=1.0 -> 10x sf0.1 row counts)
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    'a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup', 'fast',
    'filter', 'group', 'hash', 'join', 'key', 'line', 'merge', 'order',
    'part', 'query', 'row', 'scan', 'slow', 'small', 'sort', 'spark',
    'stream', 'table', 'the', 'value', 'vector', 'window'])
LANGS = ['en', 'zh', 'es', 'fr', 'de']
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def documents(rng, n):
    n_base = int(n * 0.95)
    texts = []
    for _ in range(n_base):
        k = rng.integers(8, 104)
        texts.append(' '.join(rng.choice(VOCAB, size=k)))
    # ~0.2% exact duplicates, rest of the tail near-duplicates (mutate a few
    # words of an existing doc -> shared shingles for the dedup family)
    while len(texts) < n:
        src = texts[rng.integers(0, n_base)]
        if rng.random() < 0.05:
            texts.append(src)
        else:
            w = src.split()
            for _ in range(max(1, len(w) // 20)):
                w[rng.integers(0, len(w))] = str(rng.choice(VOCAB))
            texts.append(' '.join(w))
    order = rng.permutation(n)
    texts = [texts[i] for i in order]
    return pa.table({
        'doc_id': pa.array(np.arange(n, dtype=np.int64)),
        'text': pa.array(texts),
        'lang': pa.array(rng.choice(LANGS, size=n, p=LANG_P)),
        'source': pa.array([f'src{i}' for i in rng.integers(0, 20, n)]),
        'n_chars': pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })


def embeddings(rng, n):
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        'vec_id': pa.array(np.arange(n, dtype=np.int64)),
        'embedding': pa.array(list(v), type=pa.list_(pa.float32())),
        'label': pa.array(rng.integers(0, 10, n).astype(np.int32)),
    })


def events(rng, n):
    # driver testdata now stores ts as TIMESTAMP_MICROS (pyarrow default);
    # mirror that (Tables.events adapts to either encoding regardless)
    t0 = np.datetime64('2024-01-01T00:00:00', 'us').astype(np.int64)
    span = np.int64(30 * 24 * 3600) * 1_000_000
    ts = t0 + (rng.random(n) * span).astype(np.int64)
    ts.sort()
    return pa.table({
        'event_id': pa.array(np.arange(n, dtype=np.int64)),
        'ts': pa.array(ts, type=pa.timestamp('us')),
        'user_id': pa.array(rng.integers(0, max(1, n // 67), n).astype(np.int64)),
        'event_type': pa.array(rng.choice(
            ['view', 'click', 'purchase', 'signup', 'error'], size=n)),
        # value ~ exponential(50) rounded to cents, props a tiny JSON blob —
        # matches the driver sf0.1 distributions (mean 49.9, '{"k": NN}')
        'value': pa.array(np.round(rng.exponential(50.0, n), 2)),
        'props': pa.array([f'{{"k": {v}}}' for v in rng.integers(1, 100, n)]),
    })


def day_range(rng, n, lo, hi):
    days = rng.integers(0, (np.datetime64(hi) - np.datetime64(lo)).astype(int), n)
    return (np.datetime64(lo).astype('datetime64[ms]')
            + days.astype('timedelta64[D]').astype('timedelta64[ms]'))


def relational(rng, out, n_cust, n_supp, n_part, n_ord, n_li):
    segs = ['MACHINERY', 'BUILDING', 'AUTOMOBILE', 'HOUSEHOLD', 'FURNITURE']
    pq.write_table(pa.table({
        'c_custkey': pa.array(np.arange(n_cust, dtype=np.int64)),
        'c_name': pa.array([f'Customer#{i:09d}' for i in range(n_cust)]),
        'c_nationkey': pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        'c_acctbal': pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        'c_mktsegment': pa.array(rng.choice(segs, size=n_cust)),
    }), f'{out}/customer.parquet')

    pq.write_table(pa.table({
        's_suppkey': pa.array(np.arange(n_supp, dtype=np.int64)),
        's_name': pa.array([f'Supplier#{i:09d}' for i in range(n_supp)]),
        's_nationkey': pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        's_acctbal': pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
    }), f'{out}/supplier.parquet')

    adjectives = ['large', 'hot', 'blue', 'red', 'small', 'green', 'dark', 'light']
    nouns = ['ring', 'bolt', 'cog', 'washer', 'plate', 'gear', 'pin', 'rod']
    pq.write_table(pa.table({
        'p_partkey': pa.array(np.arange(n_part, dtype=np.int64)),
        'p_name': pa.array([f'{rng.choice(adjectives)} {rng.choice(nouns)}'
                            for _ in range(n_part)]),
        'p_brand': pa.array([f'Brand#{i}' for i in rng.integers(1, 26, n_part)]),
        'p_type': pa.array(rng.choice(
            ['ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL', 'STANDARD'],
            size=n_part)),
        'p_size': pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        'p_retailprice': pa.array(np.round(rng.uniform(900, 2000, n_part), 2)),
    }), f'{out}/part.parquet')

    pq.write_table(pa.table({
        'o_orderkey': pa.array(np.arange(n_ord, dtype=np.int64)),
        'o_custkey': pa.array(rng.integers(0, n_cust, n_ord).astype(np.int64)),
        'o_orderstatus': pa.array(rng.choice(['F', 'O', 'P'], size=n_ord,
                                             p=[0.49, 0.49, 0.02])),
        'o_totalprice': pa.array(np.round(rng.uniform(900, 400000, n_ord), 2)),
        'o_orderdate': pa.array(day_range(rng, n_ord, '1995-01-01', '2001-08-02'),
                                type=pa.timestamp('ms')),
        'o_orderpriority': pa.array(rng.choice(
            ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'],
            size=n_ord)),
    }), f'{out}/orders.parquet')

    pq.write_table(pa.table({
        'l_orderkey': pa.array(np.sort(rng.integers(0, n_ord, n_li)).astype(np.int64)),
        'l_partkey': pa.array(rng.integers(0, n_part, n_li).astype(np.int64)),
        'l_suppkey': pa.array(rng.integers(0, n_supp, n_li).astype(np.int64)),
        'l_linenumber': pa.array(rng.integers(1, 8, n_li).astype(np.int32)),
        'l_quantity': pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        'l_extendedprice': pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
        'l_discount': pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        'l_tax': pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
        'l_returnflag': pa.array(rng.choice(['A', 'N', 'R'], size=n_li,
                                            p=[0.25, 0.5, 0.25])),
        'l_linestatus': pa.array(rng.choice(['F', 'O'], size=n_li)),
        'l_shipdate': pa.array(day_range(rng, n_li, '1995-01-02', '2001-11-05'),
                               type=pa.timestamp('ms')),
    }), f'{out}/lineitem.parquet')


def main():
    out, scale = sys.argv[1], float(sys.argv[2])
    import os
    import shutil
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    # static dimension tables: copy from the driver's sf0.1
    for t in ['region', 'nation']:
        shutil.copy(f'/root/testdata/sf0.1/{t}.parquet', f'{out}/{t}.parquet')
    k = scale * 10  # multiplier vs the observed sf0.1 counts
    pq.write_table(documents(rng, int(5000 * k)), f'{out}/documents.parquet')
    pq.write_table(embeddings(rng, int(2000 * k)), f'{out}/embeddings.parquet')
    pq.write_table(events(rng, int(100000 * k)), f'{out}/events.parquet')
    relational(rng, out, int(15000 * k), int(1000 * k), int(20000 * k),
               int(150000 * k), int(600000 * k))
    print(f'wrote {out} at scale {scale}')


if __name__ == '__main__':
    main()
