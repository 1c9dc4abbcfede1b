#!/usr/bin/env python3
"""Deterministic 10x scale-up of sf0.1 documents/embeddings/events into
target/sf1 (local tooling only — the library never reads this path).

Copies keep the source distribution but are NOT near-duplicates of each
other: a copy-specific token is interleaved into the text every 5 words
(destroys shingle/winnow overlap between copies), and embeddings get a
small deterministic per-copy perturbation (keeps cluster geometry,
breaks exact duplication). Event timestamps shift by one hour per copy
so sessionization/window load scales in groups, not in duplicates."""
import pyarrow as pa
import pyarrow.parquet as pq
import numpy as np
import os

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/target/sf1"
COPIES = 10
os.makedirs(DST, exist_ok=True)

# documents -------------------------------------------------------------
t = pq.read_table(f"{SRC}/documents.parquet")
n = t.num_rows
doc_id = t["doc_id"].to_numpy()
text = t["text"].to_pylist()
lang = t["lang"].to_pylist()
source = t["source"].to_pylist()
base = int(doc_id.max()) + 1

ids, txts, langs, srcs, nchars = [], [], [], [], []
for c in range(COPIES):
    tok = f"qz{c}marker"
    for i in range(n):
        ids.append(int(doc_id[i]) + c * base)
        if c == 0:
            s = text[i]
        else:
            w = text[i].split(" ")
            out = []
            for j, word in enumerate(w):
                out.append(word)
                if j % 5 == 4:
                    out.append(tok)
            s = " ".join(out)
        txts.append(s)
        langs.append(lang[i])
        srcs.append(source[i])
        nchars.append(len(s))
pq.write_table(pa.table({
    "doc_id": pa.array(ids, pa.int64()),
    "text": pa.array(txts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array(srcs, pa.string()),
    "n_chars": pa.array(nchars, pa.int64()),
}), f"{DST}/documents.parquet")
print("documents:", len(ids))

# embeddings ------------------------------------------------------------
t = pq.read_table(f"{SRC}/embeddings.parquet")
vec_id = t["vec_id"].to_numpy()
emb = np.array(t["embedding"].to_pylist(), dtype=np.float32)  # (n, d)
label = t["label"].to_numpy()
nb = int(vec_id.max()) + 1
d = emb.shape[1]
all_ids, all_emb, all_lab = [], [], []
for c in range(COPIES):
    # deterministic small rotation-free perturbation per copy
    scale = 1.0 + 0.01 * (((c * 31 + np.arange(d)) % 7) - 3)
    all_ids.append(vec_id + c * nb)
    all_emb.append((emb * scale.astype(np.float32)))
    all_lab.append(label)
ids = np.concatenate(all_ids)
vecs = np.concatenate(all_emb)
labs = np.concatenate(all_lab)
pq.write_table(pa.table({
    "vec_id": pa.array(ids, pa.int64()),
    "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    "label": pa.array(labs, pa.int32()),
}), f"{DST}/embeddings.parquet")
print("embeddings:", len(ids))

# events ----------------------------------------------------------------
t = pq.read_table(f"{SRC}/events.parquet")
eid = t["event_id"].to_numpy()
ts = t["ts"].to_numpy()  # datetime64[ns]
uid = t["user_id"].to_numpy()
etype = t["event_type"].to_pylist()
val = t["value"].to_numpy()
props = t["props"].to_pylist()
ne = int(eid.max()) + 1
nu = int(uid.max()) + 1
rows_id, rows_ts, rows_uid, rows_t, rows_v, rows_p = [], [], [], [], [], []
for c in range(COPIES):
    rows_id.append(eid + c * ne)
    rows_ts.append(ts + np.timedelta64(3600 * c, "s"))
    rows_uid.append(uid + c * nu)
    rows_t.extend(etype)
    rows_v.append(val)
    rows_p.extend(props)
pq.write_table(pa.table({
    "event_id": pa.array(np.concatenate(rows_id), pa.int64()),
    "ts": pa.array(np.concatenate(rows_ts).astype("datetime64[ns]"),
                   pa.timestamp("ns")),
    "user_id": pa.array(np.concatenate(rows_uid), pa.int64()),
    "event_type": pa.array(rows_t, pa.string()),
    "value": pa.array(np.concatenate(rows_v), pa.float64()),
    "props": pa.array(rows_p, pa.string()),
}), f"{DST}/events.parquet")
print("events:", len(rows_t))
