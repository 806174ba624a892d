#!/usr/bin/env python3
"""Re-measure the float-threshold margins the oracle queries rely on.

The embedding queries compare against fixed cosine thresholds; they
are only hash-safe because no pair sits within float-error distance
of a threshold. If the driver ever regenerates the test data, run
this and re-pick thresholds (OpsQueries: dedup_embedding tau,
ann_cosine_topk k).

Usage: python3 tools/margins.py [sfdir]
"""
import sys
import numpy as np
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
t = pq.read_table(f"{sfdir}/embeddings.parquet").to_pandas()
E = np.stack(t["embedding"].values).astype(np.float64)
En = E / np.linalg.norm(E, axis=1, keepdims=True)
C = En @ En.T
np.fill_diagonal(C, -2)
cos = C[np.triu_indices(len(E), 1)]

for tau in (0.40, 0.42, 0.45, 0.50):
    print(f"tau={tau}: pairs>=tau {np.sum(cos >= tau):5d}, "
          f"min|cos-tau| {np.abs(cos - tau).min():.2e}  "
          f"({'SAFE' if np.abs(cos - tau).min() > 1e-5 else 'UNSAFE'})")

q, db = En[:10], En[10:]
S = q @ db.T
gaps = [np.sort(S[i])[::-1][4] - np.sort(S[i])[::-1][5] for i in range(len(q))]
print(f"top-5 ANN rank-boundary min gap: {min(gaps):.2e} "
      f"({'SAFE' if min(gaps) > 1e-6 else 'UNSAFE'})")
