#!/usr/bin/env python3
"""Seed-parameterized replica of the driver's synthetic testdata generator.

Purpose (VERDICT r16 worklist #1): the driver's oracle gate always runs on
the SAME fixed parquet (seed=42), so any engine bug that happens to agree
with the oracle on that one data shape is invisible — the q330 zero-token
throw and q339 weight-floor zeroing were exactly this class. This tool
regenerates schema- and distribution-compatible tables under a FRESH seed
so the full Verify -> DuckDB gate can be replayed on data the queries have
never seen.

Distributions/vocabularies mirror /root/testdata/sf0.001 (measured):
same column names/dtypes, same categorical vocabularies (queries filter on
them), same date ranges, same FK validity + sortedness invariants.

`--edge` additionally injects rare degenerate-but-legal shapes the driver
data lacks: 1-token documents, exact-duplicate texts, a single-document
language, empty-line orders. These stress assumptions like "every doc has
>=10 tokens" without violating schema or FK contracts.

Usage: python3 tools/gen_testdata.py OUTDIR [--seed N] [--sf F] [--edge]
"""
import argparse, json, os
import numpy as np
import pandas as pd

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
REGIONS = ['AFRICA', 'AMERICA', 'ASIA', 'EUROPE', 'MIDDLE EAST']
SEGMENTS = ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY']
PRIORITIES = ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW']
PTYPES = ['ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL', 'STANDARD']
ADJ = ['blue', 'cold', 'green', 'hot', 'large', 'red', 'small', 'warm']
NOUN = ['bolt', 'gear', 'plate', 'rod', 'screw', 'spring', 'widget', 'wire']
EVENT_TYPES = ['click', 'error', 'purchase', 'signup', 'view']
LANGS = ['de', 'en', 'es', 'fr', 'zh']


def r2(x):
    return np.round(x, 2)


def gen(outdir, seed, sf, edge):
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)

    n_cust = max(15, int(150000 * sf))
    n_supp = max(10, int(10000 * sf))
    n_part = max(20, int(200000 * sf))
    n_ord = max(150, int(1500000 * sf))
    n_ev = max(100, int(1000000 * sf))
    n_doc = max(500, int(50000 * sf))
    n_emb = max(500, int(20000 * sf))
    n_users = max(15, int(1500 * sf))

    pd.DataFrame({'r_regionkey': np.arange(5, dtype=np.int32),
                  'r_name': REGIONS}).to_parquet(f'{outdir}/region.parquet')

    pd.DataFrame({
        'n_nationkey': np.arange(25, dtype=np.int32),
        'n_name': [f'NATION_{i}' for i in range(25)],
        'n_regionkey': rng.integers(0, 5, 25).astype(np.int32),
    }).to_parquet(f'{outdir}/nation.parquet')

    pd.DataFrame({
        'c_custkey': np.arange(n_cust, dtype=np.int64),
        'c_name': [f'Customer#{i:09d}' for i in range(n_cust)],
        'c_nationkey': rng.integers(0, 25, n_cust).astype(np.int32),
        'c_acctbal': r2(rng.uniform(-1000, 10000, n_cust)),
        'c_mktsegment': rng.choice(SEGMENTS, n_cust),
    }).to_parquet(f'{outdir}/customer.parquet')

    pd.DataFrame({
        's_suppkey': np.arange(n_supp, dtype=np.int64),
        's_name': [f'Supplier#{i:09d}' for i in range(n_supp)],
        's_nationkey': rng.integers(0, 25, n_supp).astype(np.int32),
        's_acctbal': r2(rng.uniform(-1000, 10000, n_supp)),
    }).to_parquet(f'{outdir}/supplier.parquet')

    pd.DataFrame({
        'p_partkey': np.arange(n_part, dtype=np.int64),
        'p_name': [f'{rng.choice(ADJ)} {rng.choice(NOUN)}' for _ in range(n_part)],
        'p_brand': [f'Brand#{b}' for b in rng.integers(1, 26, n_part)],
        'p_type': rng.choice(PTYPES, n_part),
        'p_size': rng.integers(1, 51, n_part).astype(np.int32),
        'p_retailprice': r2(rng.uniform(900, 920, n_part)),
    }).to_parquet(f'{outdir}/part.parquet')

    # orders: contiguous keys, dates at day granularity in the TPC-H window
    odate_days = rng.integers(0, 2405, n_ord)  # 1995-01-01 .. 2001-08-01
    odates = (pd.Timestamp('1995-01-01')
              + pd.to_timedelta(odate_days, unit='D')).astype('datetime64[us]')
    orders = pd.DataFrame({
        'o_orderkey': np.arange(n_ord, dtype=np.int64),
        'o_custkey': rng.integers(0, n_cust, n_ord).astype(np.int64),
        'o_orderstatus': rng.choice(['F', 'O', 'P'], n_ord, p=[.45, .45, .10]),
        'o_totalprice': r2(rng.uniform(1000, 500000, n_ord)),
        'o_orderdate': odates,
        'o_orderpriority': rng.choice(PRIORITIES, n_ord),
    })
    orders.to_parquet(f'{outdir}/orders.parquet')

    # lineitem: Poisson(4) lines/order clipped to <=12; some orders get 0
    nlines = np.clip(rng.poisson(4.0, n_ord), 0, 12)
    if edge:  # guarantee the empty-order shape exists even at tiny n
        nlines[rng.integers(0, n_ord, max(2, n_ord // 500))] = 0
    okeys = np.repeat(np.arange(n_ord, dtype=np.int64), nlines)
    total = len(okeys)
    linenum = np.concatenate([np.arange(1, k + 1) for k in nlines if k > 0]) \
        if total else np.array([], dtype=np.int64)
    ship_off = rng.integers(1, 96, total)
    li = pd.DataFrame({
        'l_orderkey': okeys,
        'l_partkey': rng.integers(0, n_part, total).astype(np.int64),
        'l_suppkey': rng.integers(0, n_supp, total).astype(np.int64),
        'l_linenumber': linenum.astype(np.int32),
        'l_quantity': rng.integers(1, 51, total).astype(np.float64),
        'l_extendedprice': r2(rng.uniform(900, 105000, total)),
        'l_discount': r2(rng.integers(0, 11, total) / 100.0),
        'l_tax': r2(rng.integers(0, 9, total) / 100.0),
        'l_returnflag': rng.choice(['A', 'N', 'R'], total, p=[.25, .5, .25]),
        'l_linestatus': rng.choice(['F', 'O'], total),
        'l_shipdate': pd.Series(odates.values[okeys]
                                + pd.to_timedelta(ship_off, unit='D')
                                .to_numpy()).astype('datetime64[us]'),
    })
    li.to_parquet(f'{outdir}/lineitem.parquet')

    # events: ts sorted increasing, strictly inside January 2024 (the
    # driver data never leaves the month; queries anchor on 2024-01-30)
    secs = np.sort(rng.uniform(0, 29.99 * 86400, n_ev))
    ts = (pd.Timestamp('2024-01-01')
          + pd.to_timedelta(secs, unit='s')).astype('datetime64[us]')
    pd.DataFrame({
        'event_id': np.arange(n_ev, dtype=np.int64),
        'ts': ts,
        'user_id': rng.integers(0, n_users, n_ev).astype(np.int64),
        'event_type': rng.choice(EVENT_TYPES, n_ev,
                                 p=[.3, .1, .15, .1, .35]),
        'value': r2(rng.uniform(0.01, 350, n_ev)),
        'props': [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }).to_parquet(f'{outdir}/events.parquet')

    # documents: bag-of-VOCAB texts, 10..99 tokens
    lens = rng.integers(10, 100, n_doc)
    if edge:
        lens[rng.integers(0, n_doc, max(3, n_doc // 100))] = 1  # 1-token docs
    texts = [' '.join(rng.choice(VOCAB, k)) for k in lens]
    langs = rng.choice(LANGS, n_doc).tolist()
    if edge and n_doc >= 12:
        texts[3] = texts[7]  # exact-duplicate cluster of three
        texts[11] = texts[7]
        # make one language a singleton: reassign all-but-one zh to en
        zh = [i for i, l in enumerate(langs) if l == 'zh']
        for i in zh[1:]:
            langs[i] = 'en'
    pd.DataFrame({
        'doc_id': np.arange(n_doc, dtype=np.int64),
        'text': texts,
        'lang': langs,
        'source': [f'src{s}' for s in rng.integers(0, 20, n_doc)],
        'n_chars': np.array([len(t) for t in texts], dtype=np.int64),
    }).to_parquet(f'{outdir}/documents.parquet')

    # embeddings: 10 soft clusters, unit-norm float32, dim 64
    centers = rng.normal(0, 0.2, (10, 64))
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    vecs = rng.normal(0, 1, (n_emb, 64)) + centers[labels]
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    pd.DataFrame({
        'vec_id': np.arange(n_emb, dtype=np.int64),
        'embedding': list(vecs),
        'label': labels,
    }).to_parquet(f'{outdir}/embeddings.parquet')

    manifest = {'seed': seed, 'sf': sf, 'edge': edge,
                'rows': {'customer': n_cust, 'supplier': n_supp,
                         'part': n_part, 'orders': n_ord,
                         'lineitem': int(total), 'events': n_ev,
                         'documents': n_doc, 'embeddings': n_emb}}
    with open(f'{outdir}/MANIFEST.json', 'w') as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('outdir')
    ap.add_argument('--seed', type=int, default=7)
    ap.add_argument('--sf', type=float, default=0.001)
    ap.add_argument('--edge', action='store_true')
    args = ap.parse_args()
    gen(args.outdir, args.seed, args.sf, args.edge)
