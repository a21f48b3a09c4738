#!/usr/bin/env python3
"""One-off fixture builder: copy the reference's committed golden tables
into src/test/resources/golden/, converting Feather -> Parquet (Spark has
no Feather reader; S7 is a by-design Parquet substitute) and downcasting
ns timestamps to us so Spark reads TimestampType directly.

Inputs are the reference's own committed outputs (the de-facto golden
corpus, SURVEY §5.1) — data, not code.
"""
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.parquet as pq

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "src/test/resources/golden"
OUT.mkdir(parents=True, exist_ok=True)

FEATHERS = [
    "alert_nodes",              # 286 rows: alert_id, full_path, title, date
    "alert_ttp_data",           # 826 rows: TTP-enrichment join golden
    "alert_ner_label_weights",  # 15552 rows: ER label weights (input for cpe join)
    "cpe_node_data",            # 45556 rows: cpe, cve_id (input for cpe join)
    "cpe_product_edge",         # 770 rows: similarity-join golden
]

CSVS = [
    ("data/alert_cve_edge.csv", "alert_cve_edge.csv"),          # 931 TTP pairs (c17 bug mode)
    ("data/enterprise-attack.csv", "enterprise-attack.csv"),    # 4024 techniques, QUOTE_ALL
    ("alerts/alerts_nodes_munged.csv", "alerts_nodes_munged.csv"),
    # labeled ER ground truth (match/distinct record pairs, c39-c44)
    ("data/ner_training_ORG.json", "ner_training_ORG.json"),
    ("data/ner_training_GPE.json", "ner_training_GPE.json"),
    ("data/ner_training_PERSON.json", "ner_training_PERSON.json"),
    ("data/ner_training_PRODUCT.json", "ner_training_PRODUCT.json"),
]

for name in FEATHERS:
    t = feather.read_table(REF / "data" / f"{name}.feather")
    # drop pandas index artifacts ('__index_level_0__', 'index')
    keep = [c for c in t.column_names if not c.startswith("__index") and c != "index"]
    t = t.select(keep)
    fields = []
    for f in t.schema:
        if pa.types.is_timestamp(f.type):
            # tz-aware so Spark reads TimestampType (tz-naive would read
            # as TIMESTAMP_NTZ and fail Row equality against to_timestamp)
            fields.append(pa.field(f.name, pa.timestamp("us", tz="UTC")))
        elif f.type == pa.large_string() or pa.types.is_string(f.type):
            fields.append(pa.field(f.name, pa.string()))
        else:
            fields.append(f)
    t = t.cast(pa.schema(fields))
    pq.write_table(t, OUT / f"{name}.parquet")
    print(f"{name}: {t.num_rows} rows -> {OUT / (name + '.parquet')}")

for src, dst in CSVS:
    shutil.copyfile(REF / src, OUT / dst)
    print(f"copied {src} -> {dst}")
