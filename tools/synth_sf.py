"""Generate a SYNTHETIC scale-factor directory with off-fixture
distributions, so the full 50-query oracle gate can run on data the
driver fixtures never exercise:

  * events     — 8 series (fixtures: 5) x 45 days (fixtures: 30),
                 different start date, per-type value scales spanning
                 4 orders of magnitude, one low-variance type
  * documents  — exact-dup pairs, template near-dup families of
                 varying size, empty/whitespace docs, unicode, a long
                 doc, repetitive (Gopher-gate) docs, PII, C4 markers
  * embeddings — 64-dim like the fixtures but different cluster count,
                 planted exact/near duplicates, different id range

TPC-H tables are copied verbatim from a real sf dir (the synthetic
levers are the three tables above).

Usage:
    python tools/synth_sf.py [out_dir] [seed]
    python tools/oracle_check.py <out_dir>          # the actual gate
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import numpy as np
import pandas as pd

TPCH = "region nation customer supplier part orders lineitem".split()


def gen_events(rng: np.random.RandomState) -> pd.DataFrame:
    types = [
        ("alpha", 500.0, 120.0),
        ("beta", 4.0, 1.2),
        ("gamma", 90000.0, 20000.0),
        ("delta", 0.5, 0.02),      # low variance, never constant
        ("purchase", 300.0, 90.0),  # the flagship query filters on this
        ("zeta", 12.0, 6.0),
        ("eta", 1500.0, 400.0),
        ("theta_t", 45.0, 15.0),
    ]
    rows = []
    eid = 0
    base = pd.Timestamp("2023-03-01")
    for day in range(45):
        for name, mu, sd in types:
            for _ in range(int(rng.poisson(6)) + 1):
                ts = (
                    base
                    + pd.Timedelta(days=day)
                    + pd.Timedelta(seconds=int(rng.randint(0, 86400)))
                )
                rows.append(
                    (
                        eid,
                        ts,
                        int(rng.randint(1, 30)),
                        name,
                        float(max(mu + sd * rng.randn(), 0.001)),
                        "{}",
                    )
                )
                eid += 1
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


_FILLERS = [
    "analysis of distributed query planning and shuffle behavior",
    "notes about cooking pasta with garlic and fresh tomatoes",
    "ein kurzer bericht über das wetter im norden von europa",
    "guide to repairing old bicycles with simple hand tools",
    "observations d'oiseaux migrateurs pres de la cote atlantique",
]


def gen_documents(rng: np.random.RandomState) -> pd.DataFrame:
    docs = []

    def add(text, lang="en", source="web"):
        docs.append((len(docs), text, lang, source))

    # ordinary unique docs
    for i in range(40):
        base = _FILLERS[i % len(_FILLERS)]
        words = [f"{w}{rng.randint(0, 999)}" for w in base.split()]
        add(" ".join(words * (1 + i % 3)), source=f"s{i % 4}")
    # exact duplicate pairs (normalized-equal: second copy pads spaces)
    for i in range(6):
        t = f"identical content block number {i} repeated verbatim for the dedup gate"
        add(t, source="s0")
        add("  " + t.replace(" ", "  ") + "\n", source="s1")
    # template near-dup families of growing size
    for fam in range(5):
        size = 3 + fam * 2
        stem = (
            f"breaking news template {fam}: the quick brown fox jumped over the "
            f"lazy dog in the city center while onlookers took photographs and"
        )
        for j in range(size):
            add(stem + f" witness {j} described the scene differently", source="s2")
    # degenerate docs
    add("", source="s3")
    add("   \n\t  ", source="s3")
    add("einzelwort", lang="de", source="s3")
    # unicode
    add("これは 日本語の 文書 です 単語 が 少し あります", lang="ja", source="s3")
    add("café naïve résumé protégé déjà vu encore", lang="fr", source="s3")
    # long doc (token-budget / wall-cap territory)
    add(" ".join(f"w{k % 251}" for k in range(2500)), source="s0")
    # repetitive doc (Gopher repetition gates should fire)
    add("spam spam spam spam spam " * 40, source="s1")
    # duplicated lines (C4 / dup-line fraction)
    add("the same line again\n" * 12 + "one unique closing line", source="s1")
    # PII scrub targets
    add(
        "contact jane at jane.doe@example.com or call 555-123-4567 "
        "for the full report on the quarterly numbers",
        source="s2",
    )
    # C4 page markers
    add("lorem ipsum dolor sit amet { var x = 1; } enable javascript to view",
        source="s2")
    df = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["text"].str.len().astype("int64")
    return df


def gen_embeddings(rng: np.random.RandomState) -> pd.DataFrame:
    dim, k = 64, 6
    centers = rng.randn(k, dim) * 3
    rows = []
    vid = 100  # different id range than the fixtures
    for c in range(k):
        for _ in range(20 + c * 4):
            v = centers[c] + rng.randn(dim) * 0.7
            rows.append((vid, (v / np.linalg.norm(v)).astype(np.float32), c))
            vid += 1
    # planted exact duplicates + tight near-dups
    for j in range(4):
        src = rows[j * 7]
        rows.append((vid, src[1], src[2]))
        vid += 1
        near = src[1] + (rng.randn(dim) * 0.01).astype(np.float32)
        near = (near / np.linalg.norm(near)).astype(np.float32)
        rows.append((vid, near, src[2]))
        vid += 1
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).astype(
        {"vec_id": "int64", "label": "int32"}
    )


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_sf"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 4242
    src_sf = os.environ.get("SYNTH_TPCH_SRC", "/root/testdata/sf0.001")
    rng = np.random.RandomState(seed)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for name, df in (
        ("events", gen_events(rng)),
        ("documents", gen_documents(rng)),
        ("embeddings", gen_embeddings(rng)),
    ):
        con.register(f"t_{name}", df)
        con.execute(
            f"COPY (SELECT * FROM t_{name}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"{name}: {len(df)} rows")
    for t in TPCH:
        shutil.copyfile(f"{src_sf}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"synthetic SF at {out} (tpch copied from {src_sf})")


if __name__ == "__main__":
    main()
