#!/usr/bin/env python3
"""Generate an sf-N testdata directory with the same tables/schemas as
/root/testdata/sf* so the engine can be scale-probed beyond the
driver-provided sf0.1 (TESTDATA.md says the provided dirs are
read-only and capped at sf0.1).

Usage: python3 scripts/gen_sf.py <outDir> <sf>     # e.g. /tmp/sf1 1

Star-schema tables come from DuckDB's tpch extension, projected and
cast to the driver files' exact column sets and parquet physical types
(timestamp[ms] for l_shipdate/o_orderdate). The synthetic
documents/events/embeddings tables are regenerated here with seeded
randomness matching the driver data's measured shape (vocab, length
and lang/source distributions, dup rate, event mix, clustered
embeddings). This is a slope-measurement tool: absolute row contents
differ from the driver's generator, so only compare timings generated
by THIS script against each other (the distributions match, the bytes
don't).
"""
import sys, os, json, random
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

# measured on /root/testdata/sf0.1 (5000 docs): 30-word vocabulary,
# 10..100 words/doc, lang en~41%/others ~15%, 20 uniform sources,
# ~0.16% exact-dup rate plus occasional near-dup perturbations
VOCAB = ("join hash row batch scan customer column filter small slow merge "
         "order vector line data table agg value key stream window spark a "
         "group part big sort query fast the").split()
LANGS = ["en", "de", "es", "fr", "zh"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
EMB_DIM, EMB_CLUSTERS = 64, 10


def gen_tpch(con, out, sf):
    con.sql("LOAD tpch")
    con.sql(f"CALL dbgen(sf={sf})")
    proj = {
        "lineitem": """SELECT l_orderkey, l_partkey, l_suppkey,
              CAST(l_linenumber AS INTEGER) AS l_linenumber,
              CAST(l_quantity AS DOUBLE) AS l_quantity,
              CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
              CAST(l_discount AS DOUBLE) AS l_discount,
              CAST(l_tax AS DOUBLE) AS l_tax,
              l_returnflag, l_linestatus,
              CAST(l_shipdate AS TIMESTAMP) AS l_shipdate FROM lineitem""",
        "orders": """SELECT o_orderkey, o_custkey, o_orderstatus,
              CAST(o_totalprice AS DOUBLE) AS o_totalprice,
              CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
              o_orderpriority FROM orders""",
        "customer": None, "supplier": None, "part": None,
        "nation": None, "region": None,
    }
    for t, sql in proj.items():
        if sql is None:
            ref = pq.read_schema(f"/root/testdata/sf0.1/{t}.parquet")
            cols = ", ".join(ref.names)
            sql = f"SELECT {cols} FROM {t}"
        tbl = con.sql(sql).arrow()
        # driver files store order/ship dates as timestamp[ms]
        fields = [pa.field(f.name, pa.timestamp("ms"))
                  if pa.types.is_timestamp(f.type) else f for f in tbl.schema]
        tbl = tbl.cast(pa.schema(fields))
        pq.write_table(tbl, f"{out}/{t}.parquet")
        print(t, tbl.num_rows)


def gen_documents(out, n, rng):
    ids, texts, langs, sources = [], [], [], []
    for i in range(n):
        r = rng.random()
        if i > 0 and r < 0.0016:            # exact duplicate of a recent doc
            words = texts[rng.randrange(max(0, i - 50), i)].split()
        elif i > 0 and r < 0.006:           # near duplicate: ~3 words swapped
            words = texts[rng.randrange(max(0, i - 50), i)].split()
            for _ in range(3):
                words[rng.randrange(len(words))] = rng.choice(VOCAB)
        else:
            words = [rng.choice(VOCAB) for _ in range(rng.randint(10, 100))]
        text = " ".join(words)
        ids.append(i)
        texts.append(text)
        langs.append("en" if rng.random() < 0.41 else rng.choice(LANGS[1:]))
        sources.append(f"src{i % 20}")
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    pq.write_table(tbl, f"{out}/documents.parquet")
    print("documents", n)


def gen_events(out, n, rng):
    base_ns = 1704067200 * 10**9            # 2024-01-01 UTC
    month_ns = 30 * 86400 * 10**9
    users = max(1, n // 66)                 # 1500 users per 100k events
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([base_ns + rng.randrange(month_ns) for _ in range(n)],
                       pa.timestamp("ns")),
        "user_id": pa.array([rng.randrange(users) for _ in range(n)], pa.int64()),
        "event_type": pa.array([rng.choice(EVENT_TYPES) for _ in range(n)]),
        "value": pa.array([round(rng.random() * 560, 2) for _ in range(n)],
                          pa.float64()),
        "props": pa.array([json.dumps({"k": rng.randrange(100)})
                           for _ in range(n)])})
    pq.write_table(tbl, f"{out}/events.parquet")
    print("events", n)


def gen_embeddings(out, n, rng):
    # the driver's embeddings are isotropic — same-label avg cosine ≈ 0
    # (measured on sf0.1), so labels carry no geometric cluster; mirror
    # that (tight clusters would manufacture near-dup families the real
    # data doesn't have and skew q23/q49 slope measurements)
    labels = [rng.randrange(EMB_CLUSTERS) for _ in range(n)]
    vecs = [[rng.gauss(0, 1) for _ in range(EMB_DIM)] for _ in labels]
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print("embeddings", n)


def main(out, sf):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    gen_tpch(con, out, sf)
    rng = random.Random(43)                 # fixed seed, distinct from driver's
    gen_documents(out, int(50000 * sf), rng)
    gen_events(out, int(1000000 * sf), rng)
    gen_embeddings(out, int(20000 * sf), rng)


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]))
