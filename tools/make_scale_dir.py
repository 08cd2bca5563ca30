#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata dir by
k-fold replication with structure-preserving mutations, for the
SCALECHECK heavy-tail audit (a 4th point above sf0.1).

Replication must not create artifacts the real generator wouldn't:

- documents: each copy's tokens get a per-copy suffix ("w" -> "w~1").
  A bijective token rename preserves shingle counts, document-frequency
  shape and every within-copy jaccard EXACTLY, while making cross-copy
  shingle sets disjoint -- so the near-dup pair graph scales by
  exactly k, never k^2 (naive text duplication would mint jaccard-1.0
  pairs across copies and the audit would measure the fixture, not the
  operator). n_chars is recomputed from the mutated text.
- embeddings: each copy's vector is dimension-rotated by the copy
  index. Rotation preserves norms and within-copy cosines exactly;
  cross-copy cosines fall to background level (no minted near-dups).
- orders/lineitem/part: id-like keys shift by copy*10^9 so FK joins
  stay 1:1 within a copy; dimension FKs into non-replicated tables
  (custkey, suppkey, nationkey) stay valid as-is.
- region/nation/customer/supplier/events copy through unchanged
  (configuration-scale dims; no heavy-tail query scales on them).

Per-table factor overrides (table=factor) mirror the GENERATOR's own
growth curve where it is sublinear — embeddings grow ~4x per decade of
sf (500 @ sf0.001 -> 2000 @ sf0.1), so a comparable sf0.3 point needs
factor 4^log10(3) = 1.94, not 3: over-scaling a table makes the 4th
scale point measure the fixture, not the operator. Fractional factors
replicate whole copies plus a key-ordered prefix of the next copy.

Usage: python3 tools/make_scale_dir.py /root/testdata/sf0.1 /tmp/sf0.3 3 \
           [embeddings=1.938 ...]
"""
import shutil
import sys

import duckdb


# Fractional factors take a key-ordered PREFIX of the extra copy, which
# is only sound for tables nothing else references: a fractional
# lineitem copy would reference l_partkey/l_orderkey values the part/
# orders fractional copies don't contain — dangling FKs, and every join
# at the synthesized scale point under-measures (the exact fixture
# artifact this tool exists to avoid). Whole-copy replication keeps the
# FK graph closed because all linked tables replicate in lockstep.
FK_ISOLATED = {"documents", "embeddings"}


def main() -> int:
    src, dst, k = sys.argv[1], sys.argv[2], float(sys.argv[3])
    overrides = dict(a.split("=") for a in sys.argv[4:])
    if not k.is_integer():
        raise SystemExit("make_scale_dir: the global factor must be a whole "
                         "number (fractional copies break cross-table FKs); "
                         "use per-table overrides on FK-isolated tables")
    for t, f in overrides.items():
        if not float(f).is_integer() and t not in FK_ISOLATED:
            raise SystemExit(f"make_scale_dir: fractional factor for '{t}' "
                             f"would dangle foreign keys; only "
                             f"{sorted(FK_ISOLATED)} may scale fractionally")
    # FK_ISOLATED members are isolated from the TPC-H graph, not from
    # each other: embeddings.vec_id references documents.doc_id (s10/
    # s21 join them), so an embeddings factor above the documents
    # factor mints vec_ids whose documents don't exist — inner joins
    # silently drop them and the synthesized point under-measures,
    # the exact artifact this tool exists to avoid. Fail fast.
    f_doc = float(overrides.get("documents", k))
    f_emb = float(overrides.get("embeddings", k))
    if f_emb > f_doc:
        raise SystemExit(
            f"make_scale_dir: factor(embeddings)={f_emb} exceeds "
            f"factor(documents)={f_doc} — embeddings.vec_id references "
            "documents.doc_id, so the extra vectors would dangle")
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    OFF = 10**9

    def write(table: str, union_sql: str) -> None:
        con.execute(
            f"COPY ({union_sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"[make_scale_dir] {table}: {n} rows")

    def copies(per_copy_sql: str, table: str, key: str) -> str:
        factor = float(overrides.get(table, k))
        full = int(factor)
        frac = factor - full
        parts = [per_copy_sql.format(c=c, off=c * OFF) for c in range(full)]
        if frac > 1e-9:
            n_src = con.execute(
                f"SELECT count(*) FROM '{src}/{table}.parquet'").fetchone()[0]
            m = int(round(frac * n_src))
            parts.append(
                "SELECT * FROM (" +
                per_copy_sql.format(c=full, off=full * OFF) +
                f" ORDER BY {key} LIMIT {m})")
        return " UNION ALL ".join(parts)

    d = f"'{src}/documents.parquet'"
    write("documents", copies(
        "SELECT doc_id + {off} AS doc_id, "
        "CASE WHEN {c} = 0 THEN text ELSE array_to_string("
        "  list_transform(string_split(text, ' '), w -> w || '~{c}'), ' ') "
        "END AS text, lang, source, "
        "CASE WHEN {c} = 0 THEN n_chars ELSE CAST(length(array_to_string("
        "  list_transform(string_split(text, ' '), w -> w || '~{c}'), ' ')) "
        "AS BIGINT) END AS n_chars "
        f"FROM {d}", "documents", "doc_id"))

    e = f"'{src}/embeddings.parquet'"
    write("embeddings", copies(
        "SELECT vec_id + {off} AS vec_id, "
        "CASE WHEN {c} = 0 THEN embedding ELSE "
        "  list_concat(embedding[{c}+1:len(embedding)], embedding[1:{c}]) "
        "END AS embedding, label "
        f"FROM {e}", "embeddings", "vec_id"))

    write("orders", copies(
        "SELECT o_orderkey + {off} AS o_orderkey, o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority "
        f"FROM '{src}/orders.parquet'", "orders", "o_orderkey"))

    write("lineitem", copies(
        "SELECT l_orderkey + {off} AS l_orderkey, "
        "l_partkey + {off} AS l_partkey, l_suppkey, l_linenumber, "
        "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        "l_linestatus, l_shipdate "
        f"FROM '{src}/lineitem.parquet'", "lineitem", "l_orderkey, l_linenumber"))

    write("part", copies(
        "SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, p_type, "
        "p_size, p_retailprice "
        f"FROM '{src}/part.parquet'", "part", "p_partkey"))

    for t in ["region", "nation", "customer", "supplier", "events"]:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"[make_scale_dir] {t}: copied through")

    # belt-and-suspenders for the factor guard above: with BOTH factors
    # fractional the key-ordered prefixes could still disagree at the
    # boundary (the 94th-percentile vec_id need not sit under the
    # 94th-percentile doc_id) — verify the closed FK set post-write
    dangling = con.execute(
        f"SELECT count(*) FROM '{dst}/embeddings.parquet' e "
        f"WHERE NOT EXISTS (SELECT 1 FROM '{dst}/documents.parquet' d "
        f"WHERE d.doc_id = e.vec_id)").fetchone()[0]
    if dangling:
        raise SystemExit(f"make_scale_dir: {dangling} embeddings rows "
                         "reference documents that were not replicated "
                         "(fractional-prefix mismatch)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
