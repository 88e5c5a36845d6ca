#!/usr/bin/env python3
"""Scale the driver's documents table Nx for local stress probes.

Usage: gen_scaled_docs.py <src_sf_dir> <out_dir> [copies]

Each copy keeps the original text except for a per-copy suffix token,
so every source document spawns a (copies)-clique of near-duplicates —
a deliberately near-dup-heavy corpus that stresses the dedup family's
quadratic guards (shingle df rises ~copies-fold, LSH buckets
concentrate) the way a crawl with mirrored pages would. Copy 0 is
byte-identical to the source. doc_ids offset by copy * 1_000_000.

Probe tool only — the library never reads this; the driver's testdata
stays untouched.
"""
import sys

import duckdb


def main() -> None:
    src, out = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    con = duckdb.connect()
    con.execute(f"""
    COPY (
      SELECT copy_i * 1000000 + doc_id AS doc_id,
             CASE WHEN copy_i = 0 THEN text
                  ELSE text || ' v' || copy_i END AS text,
             lang, source,
             n_chars + CASE WHEN copy_i = 0 THEN 0
                            ELSE 2 + len(CAST(copy_i AS VARCHAR)) END
               AS n_chars
      FROM read_parquet('{src}/documents.parquet')
      CROSS JOIN (SELECT unnest(range({copies})) AS copy_i)
      ORDER BY doc_id
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()[0]
    print(f"wrote {n} docs to {out}/documents.parquet")


if __name__ == "__main__":
    main()
