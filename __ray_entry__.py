"""Driver contract: entry() smoke, queries() ↔ oracle_sql() correctness.

Ray is initialised by the driver before import — nothing here calls
ray.init()/ray.shutdown(). KG queries run over a deterministic synthetic
corpus of (repo, path, commit, lang, content) rows (BASELINE.json
input_hint; the driver's testdata carries no such table); stage-1
records are persisted to parquet so the DuckDB oracles check the
distributed stages (linking join, dedup, structural edges, sort) against
the same inputs — see codetoneo4j_ray/pipelines/kg_queries.py. Data ops
run over the driver's registered views directly.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial as _partial
from typing import Any

import os as _os

SF001 = "/root/testdata/sf0.001"
# the driver gates at sf0.01; the env override lets tools/ run the same
# oracle contract at other scale factors (never set by the driver)
SF01 = _os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def entry() -> Any:
    """Flagship KG-construction pipeline at sf0.001: corpus → node table."""
    from codetoneo4j_ray.pipelines.kg_queries import q_kg_nodes

    return q_kg_nodes(SF001)


def queries() -> dict[str, Callable[[str], Any]]:
    from codetoneo4j_ray.pipelines import data_ops, graph_ops, multimodal
    from codetoneo4j_ray.pipelines.kg_queries import (
        q_kg_authored,
        q_kg_commit_edges,
        q_kg_commits,
        q_kg_edges,
        q_kg_file_history,
        q_kg_file_versions,
        q_kg_files,
        q_kg_mentions_raw,
        q_kg_degree_topk,
        q_kg_pred_counts,
        q_kg_nodes,
        q_kg_symbol_kinds,
    )

    return {
        # knowledge-graph construction (SURVEY §2 / §7)
        "kg_nodes": q_kg_nodes,
        "kg_edges": q_kg_edges,
        "kg_files": q_kg_files,
        "kg_symbol_kinds": q_kg_symbol_kinds,
        "kg_pred_counts": q_kg_pred_counts,
        "kg_degree_topk": q_kg_degree_topk,
        "kg_pagerank": graph_ops.kg_pagerank,
        "kg_triangles": graph_ops.kg_triangles,
        "kg_components": graph_ops.kg_components,
        "kg_bfs_depth": graph_ops.kg_bfs_depth,
        "kg_sssp": graph_ops.kg_sssp,
        # commit subgraph (UpsertCommit/UpsertFile cypher analogs)
        "kg_commits": q_kg_commits,
        "kg_commit_edges": q_kg_commit_edges,
        "kg_authored": q_kg_authored,
        "kg_file_history": q_kg_file_history,
        "kg_file_versions": q_kg_file_versions,
        # training-data ops: dedup family
        "doc_dedup_exact": data_ops.doc_dedup_exact,
        "doc_dedup_minhash": data_ops.doc_dedup_minhash,
        "dup_clusters": data_ops.dup_clusters,
        "doc_simhash": data_ops.doc_simhash,
        "doc_ngram_jaccard": data_ops.doc_ngram_jaccard,
        # gate threshold 0.4: the synthetic embeddings are random (max
        # pairwise cosine ≈ 0.51), so the default 0.95 yields an empty —
        # and thus unconvincing — strict match; 0.4 exercises ~60 pairs
        # through the exact path (strict oracle).  The IVF path is
        # covered by the recall pytest with exact_cutoff=0.
        "embedding_near_dup": _partial(
            data_ops.embedding_near_dup,
            threshold=data_ops._NEAR_DUP_GATE_THRESHOLD,
        ),
        # similarity search
        "ann_topk": data_ops.ann_topk,
        "embedding_quantize": data_ops.embedding_quantize,
        # text analysis
        "text_stats": data_ops.text_stats,
        "lang_id": data_ops.lang_id,
        "doc_quality": data_ops.doc_quality,
        "doc_repetition": data_ops.doc_repetition,
        "decontaminate": data_ops.decontaminate,
        "top_tokens": data_ops.top_tokens,
        "inverted_index": data_ops.inverted_index,
        "tfidf_topk": data_ops.tfidf_topk,
        "doc_fingerprint": data_ops.doc_fingerprint,
        "doc_scrub": data_ops.doc_scrub,
        "doc_winnow": data_ops.doc_winnow,
        # curation / data-mixing
        "stratified_sample": data_ops.stratified_sample,
        "group_quota": data_ops.group_quota,
        "doc_pack": data_ops.doc_pack,
        "doc_chunk": data_ops.doc_chunk,
        # streaming-shaped + relational
        "events_tumbling": data_ops.events_tumbling,
        "events_hopping": data_ops.events_hopping,
        "events_sessionize": data_ops.events_sessionize,
        "events_asof_join": data_ops.events_asof_join,
        "revenue_by_nation": data_ops.revenue_by_nation,
        "top_orders": data_ops.top_orders,
        "pricing_summary": data_ops.pricing_summary,
        "price_quantiles": data_ops.price_quantiles,
        "orders_running_total": data_ops.orders_running_total,
        # multimodal plumbing (stubbed decode)
        "media_decode_meta": multimodal.media_decode_meta,
        "media_frame_sample": multimodal.media_frame_sample,
        # rows-only entries (no SQL oracle by design) go LAST so the
        # driver's 50-entry gate window covers every strict-oracle op;
        # each is covered by a recall/shape pytest instead.
        "kg_mentions_raw": q_kg_mentions_raw,
        "ann_ivf": data_ops.ann_ivf,
        "embedding_kmeans": data_ops.embedding_kmeans,
    }


def oracle_sql() -> dict[str, str]:
    # Side effect: make sure the sf0.01 KG cache parquet exists before the
    # driver executes the SQL (the strings below read those files).
    from codetoneo4j_ray.pipelines import data_ops
    from codetoneo4j_ray.pipelines.kg_queries import ensure_kg, oracle_kg
    from codetoneo4j_ray.sources.synth import ensure_commits

    rate_case = " ".join(
        f"WHEN lang = '{lg}' THEN {r}"
        for lg, r in sorted(data_ops._SAMPLE_RATE_MICRO.items())
    )

    ensure_kg(SF01)
    ensure_commits(SF01)
    sql = dict(oracle_kg(SF01))
    sql.pop("kg_mentions_raw", None)

    tok = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\f\r]"
    sql.update(
        {
            "doc_dedup_exact": """
                SELECT min(doc_id) AS doc_id, count(*) AS n_dups
                FROM documents GROUP BY text ORDER BY doc_id
            """,
            "text_stats": f"""
                SELECT doc_id,
                       length(text) AS n_chars,
                       length(regexp_extract_all(text, '{tok}')) AS n_tokens,
                       length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct
                FROM documents ORDER BY doc_id
            """,
            "doc_quality": """
                WITH q AS (
                    SELECT doc_id,
                           length(text) AS n_chars,
                           len(list_filter(regexp_split_to_array(
                               text, '[ \t\n\r]+'), w -> w <> '')) AS n_words,
                           CASE WHEN length(text) = 0 THEN 0
                                ELSE (length(regexp_replace(
                                          text, '[^.,!?;:]', '', 'g')) * 100)
                                     // length(text)
                           END AS punct_per_100_chars
                    FROM documents
                )
                SELECT doc_id, n_chars, n_words, punct_per_100_chars,
                       (n_chars BETWEEN 50 AND 100000)
                           AND n_words >= 10
                           AND punct_per_100_chars <= 20 AS keep
                FROM q ORDER BY doc_id
            """,
            "top_tokens": """
                WITH toks AS (
                    SELECT unnest(regexp_split_to_array(
                        trim(lower(text)), '[ \t\n\r]+')) AS token
                    FROM documents
                ),
                counted AS (
                    SELECT token, count(*) AS n FROM toks
                    WHERE token <> '' GROUP BY token
                ),
                ranked AS (
                    SELECT token, n, row_number() OVER (
                        ORDER BY n DESC, token
                    ) AS "rank"
                    FROM counted
                )
                SELECT "rank", token, n FROM ranked
                WHERE "rank" <= 50 ORDER BY "rank"
            """,
            "inverted_index": data_ops.inverted_index_oracle_sql(),
            "tfidf_topk": data_ops.tfidf_topk_oracle_sql(),
            "doc_scrub": r"""
                SELECT doc_id,
                       length(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS n_emails,
                       length(regexp_extract_all(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                               '<EMAIL>', 'g'),
                           '[0-9]{3,}')) AS n_nums,
                       md5(regexp_replace(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                               '<EMAIL>', 'g'),
                           '[0-9]{3,}', '<NUM>', 'g')) AS scrubbed_md5
                FROM documents ORDER BY doc_id
            """,
            "doc_fingerprint": r"""
                SELECT doc_id,
                       md5(lower(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g'))) AS fingerprint
                FROM documents ORDER BY doc_id
            """,
            # rate CASE generated from the same module constants the Ray
            # op uses, so engine and oracle cannot drift
            "stratified_sample": f"""
                SELECT doc_id, lang, n_chars
                FROM documents
                WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                      % 1000000
                      < CASE {rate_case}
                        ELSE {data_ops._SAMPLE_RATE_DEFAULT_MICRO} END
                ORDER BY doc_id
            """,
            "doc_pack": f"""
                WITH c AS (
                    SELECT lang, doc_id,
                           COALESCE(sum(n_chars) OVER (
                               PARTITION BY lang ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum_before
                    FROM documents
                )
                SELECT lang, doc_id,
                       CAST(cum_before AS BIGINT) AS cum_before,
                       CAST(cum_before // {data_ops._PACK_CAPACITY}
                            AS BIGINT) AS pack_id
                FROM c ORDER BY lang, doc_id
            """,
            "group_quota": """
                WITH ranked AS (
                    SELECT lang, doc_id, n_chars,
                           row_number() OVER (
                               PARTITION BY lang
                               ORDER BY n_chars DESC, doc_id
                           ) AS "rank"
                    FROM documents
                )
                SELECT lang, "rank", doc_id, n_chars
                FROM ranked WHERE "rank" <= 40
                ORDER BY lang, "rank"
            """,
            "ann_topk": """
                WITH q AS (
                    SELECT vec_id AS query_id, embedding
                    FROM embeddings ORDER BY vec_id LIMIT 8
                ),
                scored AS (
                    SELECT q.query_id, e.vec_id,
                           CAST(floor(list_cosine_similarity(
                               CAST(q.embedding AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[])) * 1000000)
                               AS BIGINT) AS sim_micro
                    FROM q, embeddings e
                    WHERE e.vec_id <> q.query_id
                ),
                ranked AS (
                    SELECT query_id, vec_id, sim_micro,
                           row_number() OVER (
                               PARTITION BY query_id
                               ORDER BY sim_micro DESC, vec_id
                           ) AS "rank"
                    FROM scored
                )
                SELECT query_id, "rank", vec_id, sim_micro
                FROM ranked WHERE "rank" <= 10 ORDER BY query_id, "rank"
            """,
            "embedding_quantize": """
                WITH v AS (
                    SELECT vec_id,
                           list_transform(embedding, x -> x::DOUBLE) AS x,
                           list_max(list_transform(embedding,
                               x -> abs(x::DOUBLE))) AS m
                    FROM embeddings
                ),
                s AS (
                    SELECT vec_id, x,
                           CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END
                               AS scale
                    FROM v
                )
                SELECT vec_id,
                       CAST(floor(scale * 1000000) AS BIGINT) AS scale_micro,
                       md5(COALESCE(array_to_string(list_transform(x,
                           e -> CAST(CAST(floor(e * scale) AS BIGINT)
                                     AS VARCHAR)), ','), '')) AS q_md5
                FROM s ORDER BY vec_id
            """,
            "events_tumbling": """
                SELECT user_id,
                       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS window_hour,
                       count(*) AS n_events,
                       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_milli
                FROM events GROUP BY 1, 2 ORDER BY user_id, window_hour
            """,
            "doc_simhash": r"""
                WITH w AS (
                    SELECT doc_id, unnest(list_distinct(regexp_split_to_array(
                        lower(text), '[ \t\n\r]+'))) AS word
                    FROM documents
                ),
                h AS (
                    SELECT doc_id,
                           ('0x' || substring(md5(word), 1, 16))::UBIGINT AS hv
                    FROM w WHERE word <> ''
                ),
                bits AS (
                    SELECT doc_id, i.i AS bit,
                           CASE WHEN (hv >> i.i) & 1 = 1 THEN 1 ELSE -1 END AS v
                    FROM h CROSS JOIN (SELECT unnest(range(64)) AS i) i
                ),
                acc AS (
                    SELECT doc_id, bit, sum(v) AS s FROM bits GROUP BY doc_id, bit
                ),
                val AS (
                    SELECT doc_id,
                           sum(CASE WHEN s > 0 THEN (1::UBIGINT << bit)
                               ELSE 0::UBIGINT END) AS v
                    FROM acc GROUP BY doc_id
                )
                SELECT d.doc_id,
                       lpad(lower(to_hex(COALESCE(val.v, 0)::UBIGINT)), 16, '0')
                           AS simhash
                FROM documents d LEFT JOIN val ON d.doc_id = val.doc_id
                ORDER BY d.doc_id
            """,
            "lang_id": r"""
                WITH w AS (
                    SELECT doc_id,
                           list_distinct(regexp_split_to_array(
                               lower(text), '[ \t\n\r]+')) AS words
                    FROM documents
                ),
                langs(lang, stops) AS (VALUES
                    ('de', ['der','die','das','und','ist','nicht','ein','zu','mit','von']),
                    ('en', ['the','and','of','to','a','in','is','that','it','for']),
                    ('es', ['el','la','los','y','es','un','una','de','no','por']),
                    ('fr', ['le','la','les','et','est','un','une','de','pas','pour'])
                ),
                scored AS (
                    SELECT w.doc_id, l.lang,
                           len(list_intersect(w.words, l.stops)) AS hits
                    FROM w CROSS JOIN langs l
                ),
                ranked AS (
                    SELECT doc_id, lang, hits,
                           row_number() OVER (
                               PARTITION BY doc_id ORDER BY hits DESC, lang
                           ) AS rn
                    FROM scored
                )
                SELECT doc_id,
                       CASE WHEN hits > 0 THEN lang ELSE 'unknown' END AS lang_pred
                FROM ranked WHERE rn = 1 ORDER BY doc_id
            """,
            "events_hopping": """
                SELECT user_id, window_start,
                       count(*) AS n_events,
                       CAST(sum(value_milli) AS BIGINT) AS sum_milli
                FROM (
                    SELECT e.user_id,
                           (CAST(floor(epoch(e.ts)) AS BIGINT) // 900) * 900
                               - h.i * 900 AS window_start,
                           CAST(floor(e.value * 1000) AS BIGINT) AS value_milli
                    FROM events e
                    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) h
                )
                GROUP BY user_id, window_start
                ORDER BY user_id, window_start
            """,
            "events_sessionize": """
                WITH e AS (
                    SELECT user_id, event_id,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec
                    FROM events
                ),
                l AS (
                    SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                                   OR sec - lag(sec) OVER w > 1800
                              THEN 1 ELSE 0 END AS new_s
                    FROM e
                    WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
                ),
                s AS (
                    SELECT *, SUM(new_s) OVER (
                        PARTITION BY user_id ORDER BY sec, event_id
                        ROWS UNBOUNDED PRECEDING
                    ) AS session_id
                    FROM l
                )
                SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                       count(*) AS n_events,
                       min(sec) AS start_sec, max(sec) AS end_sec
                FROM s GROUP BY user_id, session_id
                ORDER BY user_id, session_id
            """,
            "events_asof_join": """
                WITH e AS (
                    SELECT event_id, user_id, event_type, ts,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec
                    FROM events
                ),
                m AS (
                    SELECT event_id, user_id, sec,
                           last_value(CASE WHEN event_type = 'signup'
                                      THEN event_id END IGNORE NULLS)
                               OVER w AS ref_event_id,
                           last_value(CASE WHEN event_type = 'signup'
                                      THEN sec END IGNORE NULLS)
                               OVER w AS ref_sec
                    FROM e
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING)
                )
                SELECT event_id, user_id, ref_event_id,
                       sec - ref_sec AS gap_sec
                FROM m WHERE ref_event_id IS NOT NULL
                ORDER BY event_id
            """,
            "revenue_by_nation": """
                SELECT n.n_name,
                       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS revenue_cents,
                       count(*) AS n_items
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                GROUP BY n.n_name ORDER BY n.n_name
            """,
            "top_orders": """
                WITH seg AS (
                    SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING'
                ),
                o AS (
                    SELECT o_orderkey,
                           CAST(floor(epoch(o_orderdate)) AS BIGINT)
                               AS orderdate_sec,
                           o_orderpriority
                    FROM orders JOIN seg ON o_custkey = c_custkey
                    WHERE o_orderdate < TIMESTAMP '1998-07-01'
                ),
                l AS (
                    SELECT l_orderkey,
                           CAST(sum(CAST(floor(l_extendedprice
                               * (1 - l_discount) * 100) AS BIGINT))
                               AS BIGINT) AS revenue_cents
                    FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-07-01'
                    GROUP BY l_orderkey
                ),
                j AS (
                    SELECT o.o_orderkey, o.orderdate_sec, o.o_orderpriority,
                           l.revenue_cents
                    FROM o JOIN l ON o.o_orderkey = l.l_orderkey
                ),
                r AS (
                    SELECT *, row_number() OVER (
                        ORDER BY revenue_cents DESC, o_orderkey
                    ) AS rn FROM j
                )
                SELECT o_orderkey, orderdate_sec, o_orderpriority,
                       revenue_cents
                FROM r WHERE rn <= 10 ORDER BY o_orderkey
            """,
            "pricing_summary": """
                SELECT l_returnflag, l_linestatus,
                       CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty,
                       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price,
                       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price,
                       count(*) AS count_order
                FROM lineitem
                GROUP BY l_returnflag, l_linestatus
                ORDER BY l_returnflag, l_linestatus
            """,
            "price_quantiles": data_ops.price_quantiles_oracle_sql(),
            "orders_running_total": data_ops.ORDERS_RUNNING_TOTAL_SQL,
            "media_frame_sample": """
                WITH meta AS (
                    SELECT doc_id AS media_id,
                           octet_length(encode(text)) AS n_bytes,
                           octet_length(encode(text)) % 16 AS n_frames
                    FROM documents
                )
                SELECT media_id, f.i AS frame_idx,
                       md5(media_id || ':' || f.i || ':' || n_bytes)
                           AS frame_md5
                FROM meta, UNNEST(range(0, n_frames, 2)) AS f(i)
                ORDER BY media_id, frame_idx
            """,
            "media_decode_meta": """
                SELECT doc_id AS media_id,
                       octet_length(encode(text)) AS n_bytes,
                       octet_length(encode(text)) % 640 AS width,
                       (octet_length(encode(text)) * 7) % 480 AS height,
                       octet_length(encode(text)) % 16 AS n_frames
                FROM documents ORDER BY media_id
            """,
        }
    )
    from codetoneo4j_ray.pipelines.data_ops import (
        decontaminate_oracle_sql,
        doc_chunk_oracle_sql,
        doc_repetition_oracle_sql,
        dup_clusters_oracle_sql,
        minhash_oracle_sql,
        near_dup_oracle_sql,
        ngram_jaccard_oracle_sql,
        winnow_oracle_sql,
    )

    sql["doc_dedup_minhash"] = minhash_oracle_sql()
    sql["dup_clusters"] = dup_clusters_oracle_sql()
    sql["doc_ngram_jaccard"] = ngram_jaccard_oracle_sql()
    sql["doc_winnow"] = winnow_oracle_sql()
    sql["decontaminate"] = decontaminate_oracle_sql()
    sql["doc_repetition"] = doc_repetition_oracle_sql()
    sql["doc_chunk"] = doc_chunk_oracle_sql()
    # strict only for the exact (below-cutoff) path the gate exercises;
    # the IVF path above the cutoff stays pytest-recall-covered
    sql["embedding_near_dup"] = near_dup_oracle_sql()
    # ann_ivf / embedding_kmeans / kg_mentions_raw are approximate,
    # iterative, or raw-stream analogs → rows-only.
    return sql
