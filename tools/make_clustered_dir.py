#!/usr/bin/env python3
"""Synthesize a CLUSTERED-geometry twin of a testdata dir for the
s-family geometry audit (SURVEY §8, r13).

The driver corpus's embeddings are near-isotropic (s24 measured
rbar2 = 2325 ppm), so every corpus-level ANN/mining measurement in the
scale ledger exercises only the worst-case geometry — the one where
IVF calibration honestly solves ~half the cells. AnnSpec plants
clustered fixtures at SPEC scale; this tool plants the same geometry
at CORPUS scale so s02/s03/s10/s22 can be measured on BOTH geometries
(GEOCHECK.json), closing the "calibration prices geometry" claim with
corpus-level numbers.

Geometry: n_clusters unit centers drawn from a deterministic RNG
(seed 42), members = center + Gaussian noise (sigma 0.05 before
renormalization) → within-cluster cosine ≈ 0.99+, cross-cluster
cosine at the random-vectors background. Row count, vec_id set, dim,
label column and every OTHER table are copied unchanged, so any query
joining documents ⋈ embeddings sees the same keys.

Usage: python3 tools/make_clustered_dir.py <src_dir> <dst_dir> [n_per_cluster=50]
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> int:
    if len(sys.argv) < 3:
        print("usage: make_clustered_dir.py <src_dir> <dst_dir> "
              "[n_per_cluster=50]", file=sys.stderr)
        return 2
    src, dst = sys.argv[1], sys.argv[2]
    per_cluster = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            shutil.copyfile(os.path.join(src, f), os.path.join(dst, f))

    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    missing = {"vec_id", "label", "embedding"} - set(t.column_names)
    if missing:
        print(f"[make_clustered_dir] embeddings.parquet lacks expected "
              f"column(s) {sorted(missing)} (have {t.column_names}); "
              f"this tool only understands the driver testdata layout",
              file=sys.stderr)
        return 2
    vec_ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    first = t.column("embedding")[0].as_py()
    if not isinstance(first, list) or not first:
        print("[make_clustered_dir] 'embedding' is not a non-empty "
              "list column; expected list<float32>", file=sys.stderr)
        return 2
    dim = len(first)
    n = len(vec_ids)
    n_clusters = max(8, n // per_cluster)

    rng = np.random.RandomState(42)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # deterministic assignment: vec_id mod n_clusters (balanced)
    assign = (vec_ids % n_clusters).astype(int)
    vecs = centers[assign] + 0.05 * rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    emb = pa.array(list(vecs.astype(np.float32)),
                   type=pa.list_(pa.float32()))
    out = pa.table({"vec_id": pa.array(vec_ids, type=pa.int64()),
                    "embedding": emb,
                    "label": pa.array(labels, type=pa.int32())})
    pq.write_table(out, os.path.join(dst, "embeddings.parquet"))
    print(f"[make_clustered_dir] {n} vectors, {n_clusters} clusters, "
          f"dim {dim} -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
