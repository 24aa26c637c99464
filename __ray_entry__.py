"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in wrangler_ray) calls ray.init()/ray.shutdown().

- entry(): flagship CDC pipeline at sf0.001 (events-derived change stream →
  lake upsert with in-flight directive chain) → final table Dataset.
- queries(): one entry per implemented operator/pipeline (SURVEY.md §2 +
  training-data ops); each takes sf_dir and returns Dataset/DataFrame/Table.
- oracle_sql(): DuckDB-equivalent SQL for the SQL-expressible entries
  (column names match the Ray results exactly).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _read(sf_dir: str, name: str, **kw):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), **kw)


def _round_cols(table: pa.Table, cols: dict[str, int]) -> pa.Table:
    for c, nd in cols.items():
        if c in table.column_names:
            i = table.column_names.index(c)
            table = table.set_column(
                i, c, pc.round(pc.cast(table.column(c), pa.float64()), ndigits=nd)
            )
    return table


# ---------------------------------------------------------------------------
# CDC: derive a deterministic change stream from the events table
# ---------------------------------------------------------------------------

_CDC_DERIVE_SQL_SHAPE = """
    lsn      = event_id
    op       = 'D' if value < 5 else 'U'
    conv_id  = 'conv-' || (user_id % 500)
    turn_idx = event_id % 20
    text     = props ; ts = ts
"""


def _derive_changes(sf_dir: str) -> pa.Table:
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    value = ev.column("value")
    op = pc.if_else(pc.less(value, 5.0), pa.scalar("D"), pa.scalar("U"))
    user = ev.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    conv = pa.array(["conv-" + str(u) for u in (user % 500)], pa.string())
    eid = ev.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "lsn": pa.array(eid, pa.int64()),
            "op": op,
            "conv_id": conv,
            "turn_idx": pa.array((eid % 20).astype(np.int32), pa.int32()),
            "text": ev.column("props"),
            "ts": ev.column("ts"),
        }
    )


def _run_cdc(sf_dir: str, recipe=None):
    from wrangler_ray.cdc.engine import CdcTable

    changes = _derive_changes(sf_dir)
    workdir = tempfile.mkdtemp(prefix="wr_cdc_")
    seg_dir = os.path.join(workdir, "segments")
    os.makedirs(seg_dir)
    # split into 4 segments by lsn order (cross-segment merge exercised)
    idx = pc.sort_indices(changes, sort_keys=[("lsn", "ascending")])
    changes = changes.take(idx)
    n = changes.num_rows
    segs = []
    for i in range(4):
        part = changes.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4)
        p = os.path.join(seg_dir, f"segment-{i:03d}.parquet")
        pq.write_table(part, p)
        segs.append(p)
    table = CdcTable(os.path.join(workdir, "lake"), num_partitions=16)
    table.apply_changes(segs, recipe=recipe)
    out = table.read_arrow(drop_internal=False)
    names = ["lsn" if c == "_lsn" else c for c in out.column_names]
    return out.rename_columns(names)


def entry() -> Any:
    """Flagship: CDC apply at sf0.001 with an in-flight directive chain."""
    sf_dir = "/root/testdata/sf0.001"
    out = _run_cdc(sf_dir)
    import ray.data as rd

    return rd.from_arrow(out)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    from wrangler_ray.pipeline import apply_recipe

    def directive_chain_docs(sf_dir):
        ds = _read(sf_dir, "documents")
        return apply_recipe(
            ds,
            [
                "lowercase :lang",
                "filter-row exp:{lang == 'en'} false",
                "set-column :text_len exp:{string:length(text)}",
                "drop :source",
            ],
        )

    def mask_hash_customer(sf_dir):
        ds = _read(sf_dir, "customer")
        return apply_recipe(
            ds,
            [
                "copy :c_name :name_hash",
                "hash :name_hash 'MD5' true",
                "set-column :bal_neg exp:{c_acctbal < 0}",
            ],
        )

    def pricing_summary(sf_dir):
        from ray.data.aggregate import Count, Mean, Sum

        ds = _read(
            sf_dir,
            "lineitem",
            columns=[
                "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_shipdate",
            ],
        )

        def prep(t: pa.Table) -> pa.Table:
            import datetime as dt

            cutoff = pa.scalar(dt.datetime(1998, 9, 2), pa.timestamp("us"))
            t = t.filter(pc.less_equal(t.column("l_shipdate"), cutoff))
            disc = pc.multiply(
                t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))
            )
            charge = pc.multiply(disc, pc.add(1.0, t.column("l_tax")))
            t = t.append_column("disc_price", disc)
            return t.append_column("charge", charge)

        out = (
            ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(
                Sum("l_quantity", alias_name="sum_qty"),
                Sum("l_extendedprice", alias_name="sum_base_price"),
                Sum("disc_price", alias_name="sum_disc_price"),
                Sum("charge", alias_name="sum_charge"),
                Mean("l_quantity", alias_name="avg_qty"),
                Mean("l_extendedprice", alias_name="avg_price"),
                Mean("l_discount", alias_name="avg_disc"),
                Count(alias_name="count_order"),
            )
        )
        t = pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow", batch_size=None)]
        )
        return _round_cols(
            t,
            {
                "sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2,
                "sum_charge": 2, "avg_qty": 4, "avg_price": 4, "avg_disc": 4,
            },
        )

    def events_json_agg(sf_dir):
        from ray.data.aggregate import Count, Mean, Sum

        ds = _read(sf_dir, "events")
        parsed = apply_recipe(ds, ["parse-as-json :props 1"])
        out = parsed.groupby("event_type").aggregate(
            Count(alias_name="n"),
            Sum("value", alias_name="sum_value"),
            Mean("props_k", alias_name="avg_k"),
        )
        t = pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow", batch_size=None)]
        )
        return _round_cols(t, {"sum_value": 3, "avg_k": 4})

    def filter_regex_part(sf_dir):
        ds = _read(sf_dir, "part")
        return apply_recipe(
            ds,
            [
                "filter-by-regex if-not-matched :p_type 'PROMO.*'",
                "uppercase :p_brand",
            ],
        )

    def cut_priority_orders(sf_dir):
        from ray.data.aggregate import Count

        ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
        chained = apply_recipe(
            ds,
            [
                "cut-character :o_orderpriority :prio '1-1'",
                "quantize :o_totalprice :bucket '0:100000=small,100000.001:300000=mid,300000.001:100000000=big'",
            ],
        )
        out = chained.groupby(["prio", "bucket"]).aggregate(Count(alias_name="n"))
        return pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow", batch_size=None)]
        )

    def lookup_region_nation(sf_dir):
        from wrangler_ray.directives.lookup import register_lookup_table

        region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
        register_lookup_table("region", region, key_col="r_regionkey")
        ds = _read(sf_dir, "nation")
        return apply_recipe(ds, ["table-lookup :n_regionkey 'region'"])

    def split_words_docs(sf_dir):
        ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
        return apply_recipe(ds, ["split-to-rows :text ' '"])

    def token_counts_docs(sf_dir):
        from wrangler_ray.ops.text import TokenCount

        ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
        out = ds.map_batches(
            TokenCount, batch_format="pandas", concurrency=2
        ).drop_columns(["n_bpe_tokens", "text"])
        return out

    def dedup_exact_docs(sf_dir):
        from wrangler_ray.ops.dedup import exact_dedup

        return exact_dedup(_read(sf_dir, "documents"))

    def dedup_minhash_docs(sf_dir):
        from wrangler_ray.ops.dedup import minhash_lsh_dedup

        return minhash_lsh_dedup(_read(sf_dir, "documents"), jaccard_threshold=0.8)

    def dedup_simhash_docs(sf_dir):
        from wrangler_ray.ops.dedup import simhash_dedup

        return simhash_dedup(_read(sf_dir, "documents"))

    def dedup_embedding_vecs(sf_dir):
        from wrangler_ray.ops.dedup import embedding_dedup

        return embedding_dedup(_read(sf_dir, "embeddings"), cosine_threshold=0.99)

    def similarity_topk(sf_dir):
        from wrangler_ray.ops.similarity import brute_force_topk

        emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        q = np.asarray(emb.column("embedding").to_pylist()[0], np.float32)[None, :]
        out = brute_force_topk(_read(sf_dir, "embeddings"), q, k=10)
        out = out.drop_columns(["query_idx"])
        return _round_cols(out, {"score": 3})

    def similarity_lsh_topk(sf_dir):
        from wrangler_ray.ops.similarity import lsh_topk

        emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        q = np.asarray(emb.column("embedding").to_pylist()[0], np.float32)[None, :]
        out = lsh_topk(_read(sf_dir, "embeddings"), q, k=5, num_planes=10)
        return _round_cols(out.drop_columns(["query_idx"]), {"score": 3})

    def text_analysis_docs(sf_dir):
        from wrangler_ray.ops.text import analyze

        return analyze(_read(sf_dir, "documents", columns=["doc_id", "text"]))

    def multimodal_images(sf_dir):
        import ray.data as rd

        from wrangler_ray.ops.multimodal import image_pipeline, make_fake_image_table

        t = make_fake_image_table(n=256)
        out = image_pipeline(rd.from_arrow(t), batch_size=32)
        return out.drop_columns(["media"])

    def cdc_replay_events(sf_dir):
        return _run_cdc(sf_dir)

    return {
        "directive_chain_docs": directive_chain_docs,
        "mask_hash_customer": mask_hash_customer,
        "pricing_summary": pricing_summary,
        "events_json_agg": events_json_agg,
        "filter_regex_part": filter_regex_part,
        "cut_priority_orders": cut_priority_orders,
        "lookup_region_nation": lookup_region_nation,
        "split_words_docs": split_words_docs,
        "token_counts_docs": token_counts_docs,
        "dedup_exact_docs": dedup_exact_docs,
        "dedup_minhash_docs": dedup_minhash_docs,
        "dedup_simhash_docs": dedup_simhash_docs,
        "dedup_embedding_vecs": dedup_embedding_vecs,
        "similarity_topk": similarity_topk,
        "similarity_lsh_topk": similarity_lsh_topk,
        "text_analysis_docs": text_analysis_docs,
        "multimodal_images": multimodal_images,
        "cdc_replay_events": cdc_replay_events,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    return {
        "directive_chain_docs": """
            SELECT doc_id, text, lower(lang) AS lang, n_chars,
                   length(text) AS text_len
            FROM documents
            WHERE lower(lang) = 'en'
        """,
        "mask_hash_customer": """
            SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
                   md5(c_name) AS name_hash,
                   c_acctbal < 0 AS bal_neg
            FROM customer
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "events_json_agg": """
            SELECT event_type,
                   count(*) AS n,
                   round(sum(value), 3) AS sum_value,
                   round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k
            FROM events
            GROUP BY event_type
        """,
        "filter_regex_part": """
            SELECT p_partkey, p_name, upper(p_brand) AS p_brand, p_type,
                   p_size, p_retailprice
            FROM part
            WHERE regexp_full_match(p_type, 'PROMO.*')
        """,
        "cut_priority_orders": """
            SELECT substr(o_orderpriority, 1, 1) AS prio,
                   CASE
                     WHEN o_totalprice BETWEEN 0 AND 100000 THEN 'small'
                     WHEN o_totalprice BETWEEN 100000.001 AND 300000 THEN 'mid'
                     WHEN o_totalprice BETWEEN 300000.001 AND 100000000 THEN 'big'
                   END AS bucket,
                   count(*) AS n
            FROM orders
            GROUP BY 1, 2
        """,
        "lookup_region_nation": """
            SELECT n.n_nationkey, n.n_name, n.n_regionkey,
                   r.r_name AS n_regionkey_r_name
            FROM nation n
            LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        """,
        "split_words_docs": """
            SELECT doc_id, unnest(string_split(text, ' ')) AS text
            FROM documents
        """,
        "token_counts_docs": """
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens
            FROM documents
        """,
        "dedup_exact_docs": """
            SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
            FROM documents d
            JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text) k
              ON d.doc_id = k.doc_id
        """,
        "similarity_topk": """
            WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = (SELECT min(vec_id) FROM embeddings))
            SELECT vec_id,
                   round(list_cosine_similarity(embedding, (SELECT e FROM q)), 3) AS score
            FROM embeddings
            ORDER BY list_cosine_similarity(embedding, (SELECT e FROM q)) DESC, vec_id
            LIMIT 10
        """,
        "cdc_replay_events": """
            WITH changes AS (
                SELECT event_id AS lsn,
                       CASE WHEN value < 5 THEN 'D' ELSE 'U' END AS op,
                       'conv-' || CAST(user_id % 500 AS VARCHAR) AS conv_id,
                       CAST(event_id % 20 AS INTEGER) AS turn_idx,
                       props AS text,
                       ts
                FROM events
            ),
            ranked AS (
                SELECT *,
                       row_number() OVER (PARTITION BY conv_id, turn_idx
                                          ORDER BY lsn DESC) AS rn
                FROM changes
            )
            SELECT conv_id, turn_idx, text, ts, lsn
            FROM ranked
            WHERE rn = 1 AND op <> 'D'
        """,
        # rows-only (non-SQL-expressible): dedup_minhash_docs,
        # dedup_simhash_docs, dedup_embedding_vecs, similarity_lsh_topk,
        # text_analysis_docs, multimodal_images
    }
