#!/usr/bin/env python3
"""Scaled documents/embeddings fixtures for the scaling-curve rehearsal
(VERDICT r9 item 6) — driver-side tooling, not engine code.

Scales the sf0.1 fixtures by an integer factor using BLOCK replication
with per-block disjoint vocabulary: block k suffixes every word with
"r<k>" (texts) and offsets every id by k*10^7. Each block therefore
reproduces the original's internal near-dup/posting/df structure exactly,
while sharing zero shingles with other blocks — so the TRUE pair/cluster
output grows linearly with the corpus, and a measured runtime exponent
reflects the algorithm, not fixture-induced pair blowup (naive replication
would make every doc a near-dup clique across its copies: 10x data ->
~45x pairs, poisoning the curve).

Embeddings: block k adds a deterministic per-(id, k, dim) jitter of
±0.35 — large enough to flip sign-LSH bits near hyperplane boundaries, so
replicas SPREAD across buckets like independent points instead of piling
10 copies into the same bucket (tiny jitter made the LSH path look
superlinear purely by fixture-induced bucket degeneracy). Queries
(vec_id < 10) stay in block 0, so query count is fixed while the index
scales.

Events (r14 — closes the media/raw/compacted x-scale audit blind spot):
block k offsets event_id AND user_id by k*10^7 with everything else
verbatim, so each block reproduces the original's latest-per-key /
snapshot-fold structure exactly and the raw/compacted zone outputs grow
linearly. (The media zone needs no extra table: it synthesizes blobs
from documents, which already scale.)

Usage: python3 tools/scale_rehearsal.py [scale ...]   (default: 3 10)
Writes target/scaledata/x<scale>/{documents,embeddings,events}.parquet
Existing output files are kept (delete to regenerate) so adding a table
does not churn the others' mtimes and stale every committed zone.
"""
import sys
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000


def scale_documents(scale: int) -> pa.Table:
    t = pq.read_table(f"{SRC}/documents.parquet")
    ids, texts = t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    langs, srcs = t.column("lang").to_pylist(), t.column("source").to_pylist()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for k in range(scale):
        suf = f"r{k}" if k > 0 else ""
        for i, txt in enumerate(texts):
            s = " ".join(w + suf for w in txt.split(" ") if w) if suf else txt
            out["doc_id"].append(ids[i] + k * OFFSET)
            out["text"].append(s)
            out["lang"].append(langs[i])
            out["source"].append(srcs[i])
            out["n_chars"].append(len(s))
    return pa.table(out, schema=pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64())]))


def scale_embeddings(scale: int) -> pa.Table:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    vecs = t.column("embedding").to_pylist()
    labels = t.column("label").to_pylist()
    out = {"vec_id": [], "embedding": [], "label": []}
    for k in range(scale):
        for i, v in enumerate(vecs):
            if k == 0:
                nv = v
            else:
                # deterministic per-dim jitter from md5(id, k, j): ±0.35
                nv = []
                for j, x in enumerate(v):
                    h = hashlib.md5(f"{ids[i]}:{k}:{j}".encode()).digest()
                    nv.append(x + ((h[0] / 255.0) - 0.5) * 0.7)
            out["vec_id"].append(ids[i] + k * OFFSET)
            out["embedding"].append(nv)
            out["label"].append(labels[i])
    return pa.table(out, schema=pa.schema([
        ("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32())]))


def scale_events(scale: int) -> pa.Table:
    t = pq.read_table(f"{SRC}/events.parquet")
    cols = {name: t.column(name).to_pylist() for name in t.schema.names}
    out = {name: [] for name in t.schema.names}
    for k in range(scale):
        for i in range(t.num_rows):
            for name in t.schema.names:
                v = cols[name][i]
                if name in ("event_id", "user_id"):
                    v = v + k * OFFSET
                out[name].append(v)
    return pa.table(out, schema=t.schema)


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [3, 10]
    import os
    for scale in scales:
        dest = f"target/scaledata/x{scale}"
        os.makedirs(dest, exist_ok=True)
        tables = {"documents": scale_documents, "embeddings": scale_embeddings,
                  "events": scale_events}
        for name, fn in tables.items():
            path = f"{dest}/{name}.parquet"
            if os.path.exists(path):
                print(f"kept   {path}")
                continue
            pq.write_table(fn(scale), path)
            print(f"wrote  {path}")
        print(f"done {dest} (scale {scale})")


if __name__ == "__main__":
    main()
