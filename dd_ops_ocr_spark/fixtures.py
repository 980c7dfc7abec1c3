"""Materialized spans fixtures + DuckDB oracle SQL for the flagship family.

The graded input table (doc_id, spans:array<struct<...>>) is synthesized
deterministically from the driver's ``documents`` parquet (corpus.py).
The driver's correctness gate runs oracle SQL in DuckDB, which cannot run
the Python generator — so this module materializes the same corpus to a
parquet fixture with pure Python (pandas + pyarrow, no Spark), and
``flagship_oracle_sql`` states the extraction spec (oracle.py docstring;
identical to plans/sql_extract.py) in DuckDB SQL over that fixture.

Byte-identity of the fixture with the Spark-side input is guaranteed by
the generator being pure arithmetic (corpus.mix64) — both sides read the
same documents parquet and apply the same function.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from dd_ops_ocr_spark.schema import (
    BOILERPLATE_FRAC,
    CX,
    FOOTER_ZONE,
    GUTTER_HALF,
    HEADER_ZONE,
    MIN_PAGES_BOILERPLATE,
    PAGE_H,
    PAGE_W,
    STRIDE,
    TWOUP_MIN_SIDE,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(_REPO, ".fixtures")

_SPAN_T = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
_ARROW_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(_SPAN_T))]
)


def spans_fixture_path(sf_dir: str) -> str:
    from dd_ops_ocr_spark.corpus import GENERATOR_VERSION

    name = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(
        FIXTURE_DIR, f"spans_{name}_v{GENERATOR_VERSION}.parquet"
    )


def ensure_spans_fixture(sf_dir: str) -> str:
    """Materialize the synthetic spans corpus for ``sf_dir`` (pure Python,
    no Spark) so DuckDB oracle SQL can read it. Idempotent; atomic write
    (tmp + rename) so a concurrent Spark job never reads a partial file."""
    from dd_ops_ocr_spark import corpus

    path = spans_fixture_path(sf_dir)
    if os.path.exists(path):
        return path
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    pdf = corpus.spans_pandas(docs)
    tbl = pa.Table.from_pydict(
        {"doc_id": pdf["doc_id"].tolist(), "spans": pdf["spans"].tolist()},
        schema=_ARROW_SCHEMA,
    )
    # sweep orphan tmp files from DEAD builders first (a killed process
    # leaves <path>.tmp.<pid> forever otherwise; a LIVE builder's tmp is
    # untouched — same policy as fixture_cache's dead-builder sweep)
    import glob as _glob

    for stale in _glob.glob(f"{path}.tmp.*"):
        try:
            pid = int(stale.rsplit(".", 1)[-1])
            os.kill(pid, 0)
        except ProcessLookupError:
            try:
                os.remove(stale)
            except FileNotFoundError:
                pass  # another sweeper won
        except (ValueError, PermissionError):
            pass  # unparsable suffix / someone else's live pid
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.remove(tmp)
        except FileNotFoundError:
            pass
        raise
    return path


# Python str.strip() whitespace reachable in span text (corpus emits only
# ' ' and '\n'; the full ASCII set keeps the oracle honest on any input).
_WS = "' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)"

# Shared CTE prefix: explode -> normalize -> empty-drop -> geometry ->
# boilerplate strip -> two-up side. Mirrors plans/sql_extract.py step for
# step (the spec: oracle.py docstring; reference citations there).
def _extract_cte(path: str) -> str:
    return f"""
WITH raw AS (
  SELECT doc_id, UNNEST(spans, recursive := true)
  FROM read_parquet('{path}')
),
flat AS (
  SELECT doc_id, kind,
         CASE WHEN kind = 'text'
              THEN trim(regexp_replace(text, '\\n{{2,}}', chr(10), 'g'), {_WS})
         END AS norm,
         media_ref,
         "offset" // {STRIDE} AS page,
         ("offset" % {STRIDE}) // {PAGE_W} AS y,
         "offset" % {PAGE_W} AS x
  FROM raw
  WHERE kind <> 'text'
     OR trim(regexp_replace(text, '\\n{{2,}}', chr(10), 'g'), {_WS}) <> ''
),
zoned AS (
  SELECT *,
    CASE WHEN kind = 'text' AND y < {HEADER_ZONE} THEN 1
         WHEN kind = 'text' AND y >= {PAGE_H - FOOTER_ZONE} THEN 2
         ELSE 0 END AS zone
  FROM flat
),
np AS (
  SELECT doc_id, COUNT(DISTINCT page) AS n_pages FROM zoned GROUP BY doc_id
),
bkeys AS (
  SELECT z.doc_id, z.zone, z.norm
  FROM zoned z JOIN np USING (doc_id)
  WHERE z.zone > 0
  GROUP BY z.doc_id, z.zone, z.norm, np.n_pages
  HAVING np.n_pages >= {MIN_PAGES_BOILERPLATE}
     AND COUNT(DISTINCT z.page) >= CEIL({BOILERPLATE_FRAC} * np.n_pages)
),
kept AS (
  SELECT z.* FROM zoned z
  ANTI JOIN bkeys b
    ON z.doc_id = b.doc_id AND z.zone = b.zone AND z.norm = b.norm
),
sided AS (
  SELECT *,
    CASE WHEN SUM(CASE WHEN x >= {CX - GUTTER_HALF} AND x < {CX + GUTTER_HALF}
                       THEN 1 ELSE 0 END) OVER w = 0
          AND SUM(CASE WHEN x < {CX - GUTTER_HALF} THEN 1 ELSE 0 END)
              OVER w >= {TWOUP_MIN_SIDE}
          AND SUM(CASE WHEN x >= {CX + GUTTER_HALF} THEN 1 ELSE 0 END)
              OVER w >= {TWOUP_MIN_SIDE}
          AND x >= {CX}
         THEN 1 ELSE 0 END AS side
  FROM kept
  WINDOW w AS (PARTITION BY doc_id, page)
),
extracted AS (
  SELECT doc_id, kind,
         CASE WHEN kind = 'text' THEN norm END AS text,
         media_ref, page,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY page, side, y, x
         ) AS INTEGER) AS "order"
  FROM sided
)
"""


def flagship_oracle_sql(path: str) -> str:
    """DuckDB statement of the flagship spec over the materialized fixture."""
    return _extract_cte(path) + (
        'SELECT doc_id, kind, text, media_ref, "order" FROM extracted'
    )


# Integration fold (operators/integrate.py): texts within a page joined by
# "\n\n", pages joined by "\n\n\n" in page order; media spans become
# [media:ref] markers. string_agg(ORDER BY) = the deterministic fold.
_SEP2 = "chr(10) || chr(10)"
_SEP3 = "chr(10) || chr(10) || chr(10)"

_INTEGRATED_CTE = f""",
page_folds AS (
  SELECT doc_id, page,
         string_agg(
           CASE WHEN kind = 'text' THEN text
                ELSE '[media:' || media_ref || ']' END,
           {_SEP2} ORDER BY "order") AS page_text,
         COUNT(*) AS n_spans
  FROM extracted
  GROUP BY doc_id, page
),
integrated AS (
  SELECT doc_id,
         string_agg(page_text, {_SEP3} ORDER BY page) AS integrated_text,
         CAST(SUM(n_spans) AS BIGINT) AS spans_integrated,
         COUNT(*) AS pages_integrated
  FROM page_folds
  GROUP BY doc_id
)
"""


def integrated_oracle_sql(path: str) -> str:
    """DuckDB twin of operators/integrate.q_integrated_text."""
    return _extract_cte(path) + _INTEGRATED_CTE + """
SELECT doc_id, integrated_text, spans_integrated, pages_integrated,
       CAST(LENGTH(integrated_text) AS BIGINT) AS total_characters
FROM integrated
"""


_ARTICLES_CTE = f""",
arts AS (
  SELECT doc_id,
         CAST(LENGTH(integrated_text) AS BIGINT) AS total_characters,
         CAST(t.i AS BIGINT) AS article_number,
         parts[CAST(t.i AS INT)] AS content
  FROM (
    SELECT doc_id, integrated_text,
           string_split(integrated_text, {_SEP3}) AS parts
    FROM integrated
  ), UNNEST(range(1, len(parts) + 1)) AS t(i)
)
"""


def contract_articles_oracle_sql(path: str) -> str:
    """DuckDB twin of operators/integrate.q_contract_articles."""
    return _extract_cte(path) + _INTEGRATED_CTE + _ARTICLES_CTE + """
SELECT doc_id, article_number,
       substr(string_split(content, chr(10))[1], 1, 40) AS title,
       CAST(LENGTH(content) AS BIGINT) AS content_len,
       CASE CAST(LENGTH(content) % 4 AS INT)
         WHEN 0 THEN 'none' WHEN 1 THEN 'payment'
         WHEN 2 THEN 'liability' ELSE 'termination' END AS risk_label
FROM arts
"""


def contract_schema_oracle_sql(path: str, risk_dim_sql: str) -> str:
    """DuckDB twin of operators/integrate.q_contract_schema: the
    reference's {success, info, result.articles[], risks.contracts[]}
    JSON shape (api/main.py:1306-1357), byte-identical to Spark's
    to_json (key order, escaping, and compactness all match)."""
    return (
        _extract_cte(path) + _INTEGRATED_CTE + _ARTICLES_CTE
        + f""",
art_json AS (
  SELECT doc_id, total_characters,
         to_json(list(json_object(
             'article_number', CAST(article_number AS VARCHAR),
             -- COALESCE mirrors the Spark side: to_json omits null struct
             -- fields, json_object emits "key":null — both coalesce to ''
             'title', COALESCE(substr(string_split(content, chr(10))[1], 1, 40), ''),
             'content', content,
             'table_number', '') ORDER BY article_number))::VARCHAR
           AS articles_json,
         COUNT(*) AS n_arts,
         MIN(CASE WHEN article_number = 1
             THEN substr(string_split(content, chr(10))[1], 1, 40) END)
           AS first_title
  FROM arts
  GROUP BY doc_id, total_characters
),
riskdim AS ({risk_dim_sql}),
fired AS (
  SELECT a.doc_id,
         to_json(list(json_object('id', r.id, 'title', r.title)
                      ORDER BY r.id))::VARCHAR AS risks_json
  FROM art_json a JOIN riskdim r ON a.total_characters % (r.id + 2) = 0
  GROUP BY a.doc_id
)
SELECT a.doc_id,
  json_object(
    'success', true,
    'info', json_object(
      'title', COALESCE(a.first_title, ''),
      'party', 'Company_' || substr(a.doc_id, 5, 10) || ',Counterparty KK',
      'start_date', '', 'end_date', '', 'conclusion_date', ''),
    'result', json_object('articles', json(a.articles_json)),
    'risks', json_object('contracts', json('[' || json_object(
      'targetCompany', 'Company_' || substr(a.doc_id, 5, 10),
      'articleCount', CAST(a.n_arts AS INT),
      'risks', json(COALESCE(f.risks_json, '[]')))::VARCHAR || ']'))
  )::VARCHAR AS contract_json
FROM art_json a LEFT JOIN fired f USING (doc_id)
"""
    )


def engine_dual_oracle_sql(path: str) -> str:
    """DuckDB twin of q_engine_dual_extract (K12): the primary engine is
    the flagship + integration spec (shared CTEs); the alt engine is the
    raw DocumentAI-style pass restated directly over the unnested spans;
    the reconciliation is the same full-outer merge."""
    return _extract_cte(path) + _INTEGRATED_CTE + f""",
alt AS (
  SELECT doc_id,
         CAST(SUM(LENGTH(text)) + COUNT(*) - 1 AS BIGINT) AS alt_chars,
         CAST(COUNT(DISTINCT "offset" // {STRIDE}) AS BIGINT) AS alt_pages
  FROM raw
  WHERE kind = 'text' AND text IS NOT NULL
  GROUP BY doc_id
),
prim AS (
  SELECT doc_id,
         CAST(LENGTH(integrated_text) AS BIGINT) AS primary_chars,
         CAST(pages_integrated AS BIGINT) AS primary_pages
  FROM integrated
)
SELECT doc_id,
       CASE WHEN p.primary_chars IS NULL THEN 'alt_only'
            WHEN a.alt_chars IS NULL THEN 'primary_only'
            ELSE 'both' END AS pairing,
       CASE WHEN p.primary_chars IS NOT NULL THEN 'primary'
            ELSE 'alt' END AS engine_used,
       p.primary_chars, p.primary_pages, a.alt_chars, a.alt_pages,
       COALESCE(p.primary_chars, a.alt_chars) AS reconciled_chars
FROM prim p FULL OUTER JOIN alt a USING (doc_id)
"""


def media_resize_oracle_sql(path: str) -> str:
    """DuckDB twin of q_media_resize's OBSERVABLE surface: the media-ref
    set (one row per media span of the corpus), the target geometry, and
    the exact BMP payload size the re-encode must produce
    (54-byte headers + 4-byte-padded rows). The pixel content itself is
    not SQL-expressible and is covered by the codec round-trip pytest."""
    from dd_ops_ocr_spark.operators.multimodal import RESIZE_H, RESIZE_W

    n_bytes = 54 + ((RESIZE_W * 3 + 3) & ~3) * RESIZE_H
    return f"""
WITH raw AS (
  SELECT doc_id, UNNEST(spans, recursive := true)
  FROM read_parquet('{path}')
)
SELECT media_ref,
       CAST({RESIZE_W} AS INT) AS width,
       CAST({RESIZE_H} AS INT) AS height,
       CAST({n_bytes} AS BIGINT) AS payload_bytes
FROM raw WHERE kind = 'media'
"""


# md5-derived synth geometry (multimodal.synth_geometry), restated in SQL:
# one definition, two spellings — the same trick as the whitespace class.
_GEOM_SQL = """
  SELECT media_ref,
         CAST(8 + CAST(('0x' || substr(md5(media_ref), 1, 2)) AS INT) % 24
              AS INT) AS width,
         CAST(6 + CAST(('0x' || substr(md5(media_ref), 3, 2)) AS INT) % 20
              AS INT) AS height
  FROM (SELECT media_ref FROM raw WHERE kind = 'media')
"""

# exact 24-bit BMP payload size for (w, h): 54-byte headers + 4-byte-padded rows
_BMP_BYTES_SQL = "CAST(54 + ((width * 3 + 3) // 4) * 4 * height AS BIGINT)"


def _media_cte(path: str) -> str:
    return f"""
WITH raw AS (
  SELECT doc_id, UNNEST(spans, recursive := true)
  FROM read_parquet('{path}')
),
g AS ({_GEOM_SQL})
"""


def media_metadata_oracle_sql(path: str) -> str:
    """DuckDB twin of q_media_metadata's SQL-statable surface: the media
    ref set, format, exact BMP byte size, and the TRUE decoded dimensions
    (the md5 synth geometry — the decoder must recover exactly these).
    The pixel hash stays pytest-verified."""
    return _media_cte(path) + f"""
SELECT media_ref, 'bmp' AS format, {_BMP_BYTES_SQL} AS n_bytes, width, height
FROM g
"""


def media_metadata_jpeg_oracle_sql(path: str) -> str:
    """Same for the JPEG payload query: the decoder must recover the true
    dimensions from the entropy-coded payload (byte size is entropy-
    dependent and pytest-checked instead)."""
    return _media_cte(path) + """
SELECT media_ref, 'jpeg' AS format, width, height
FROM g
"""


def media_metadata_png_oracle_sql(path: str) -> str:
    """PNG variant: dimensions recovered from the deflate-compressed
    payload must equal the md5 synth geometry (byte size is
    deflate-dependent and pytest-checked)."""
    return _media_cte(path) + """
SELECT media_ref, 'png' AS format, width, height
FROM g
"""


def media_metadata_webp_oracle_sql(path: str) -> str:
    """WebP variant: dimensions recovered from the VP8L prefix-coded
    payload (operators/webp.py) must equal the md5 synth geometry —
    decoder-independent, so the pure and native-libwebp queries share
    it (byte size is prefix-code-dependent and pytest-checked)."""
    return _media_cte(path) + """
SELECT media_ref, 'webp' AS format, width, height
FROM g
"""


def media_binarize_oracle_sql(path: str) -> str:
    """Binarize keeps the source geometry and re-encodes as 24-bit BMP:
    the SQL-derivable surface is exactly the media_resize pattern."""
    return _media_cte(path) + f"""
SELECT media_ref, width, height, {_BMP_BYTES_SQL} AS payload_bytes
FROM g
"""


def media_upscale_oracle_sql(path: str) -> str:
    """K13 super-resolution doubles both axes and re-encodes as 24-bit
    BMP: the SQL-derivable surface is the doubled md5 geometry plus the
    exact padded-row byte size at (2w, 2h). Interpolated pixel values
    are pytest territory (planted gradients)."""
    return _media_cte(path) + """
SELECT media_ref,
       CAST(width * 2 AS INT) AS width,
       CAST(height * 2 AS INT) AS height,
       CAST(54 + ((width * 2 * 3 + 3) // 4) * 4 * height * 2 AS BIGINT)
         AS payload_bytes
FROM g
"""


def media_debug_draw_oracle_sql(path: str) -> str:
    """K14 annotation draws in place: geometry and BMP size are those of
    the source image — identical surface to media_binarize."""
    return media_binarize_oracle_sql(path)


def media_frame_sample_oracle_sql(path: str, n_frames: int = 4) -> str:
    """Frame sampling invariants in SQL: n_frames rows per media span,
    each frame a re-encoded BMP of exactly the source geometry's size."""
    return _media_cte(path) + f"""
SELECT media_ref, CAST(t.i AS INT) AS frame_idx,
       {_BMP_BYTES_SQL} AS frame_bytes
FROM g, UNNEST(range(0, {n_frames})) AS t(i)
"""


def media_video_frames_oracle_sql(path: str, n_frames: int = 3) -> str:
    """DuckDB twin of q_media_video_frames' SQL-statable surface: the
    md5-derived container frame count (multimodal.synth_frame_count
    restated), the integer round-half-up sampling arithmetic
    (video.sample_indices restated — banker's-free on purpose), and the
    decoded dimensions. Frame bytes are entropy-coded, pytest-checked."""
    return _media_cte(path) + f"""
, v AS (
  SELECT media_ref, width, height,
         CAST(2 + CAST(('0x' || substr(md5(media_ref), 5, 2)) AS INT) % 7
              AS INT) AS n_src
  FROM g
),
s AS (SELECT *, LEAST({n_frames}, n_src) AS kk FROM v)
SELECT media_ref,
       CAST(t.i AS INT) AS frame_idx,
       CAST(CASE WHEN kk <= 1 THEN 0
                 ELSE (2 * t.i * (n_src - 1) + (kk - 1)) // (2 * (kk - 1))
            END AS INT) AS src_idx,
       n_src AS n_src_frames, width, height
FROM s, UNNEST(range(0, kk)) AS t(i)
"""


def media_video_delta_frames_oracle_sql(
    path: str, n_frames: int = 3, kf_interval: int = 3
) -> str:
    """DuckDB twin of q_media_video_delta_frames: the media_video_frames
    surface plus the keyframe index the idx1-flag seek must land on —
    with keyframes written every kf_interval frames, the governing
    keyframe of src is src - src % kf_interval. The Spark side derives
    it from the container's AVIIF_KEYFRAME flags, so a hash match proves
    the index parsing and the seek, not just the sampling."""
    return _media_cte(path) + f"""
, v AS (
  SELECT media_ref, width, height,
         CAST(2 + CAST(('0x' || substr(md5(media_ref), 5, 2)) AS INT) % 7
              AS INT) AS n_src
  FROM g
),
s AS (SELECT *, LEAST({n_frames}, n_src) AS kk FROM v),
e AS (
  SELECT media_ref, n_src, width, height,
         CAST(t.i AS INT) AS frame_idx,
         CAST(CASE WHEN kk <= 1 THEN 0
                   ELSE (2 * t.i * (n_src - 1) + (kk - 1)) // (2 * (kk - 1))
              END AS INT) AS src_idx
  FROM s, UNNEST(range(0, kk)) AS t(i)
)
SELECT media_ref, frame_idx, src_idx,
       CAST(src_idx - src_idx % {kf_interval} AS INT) AS key_idx,
       n_src AS n_src_frames, width, height
FROM e
"""


def _audio_params_cte(where: str = "") -> str:
    """The md5-derived audio synthesis parameters
    (multimodal.synth_audio_params restated in SQL), shared by the
    features and quarantine oracles so the arithmetic cannot drift."""
    return f"""
, a AS (
  SELECT media_ref,
         (CASE CAST(('0x' || substr(md5(media_ref), 7, 2)) AS INT) % 4
               WHEN 0 THEN 8000 WHEN 1 THEN 16000
               WHEN 2 THEN 22050 ELSE 44100 END) AS sample_rate,
         CAST(1 + CAST(('0x' || substr(md5(media_ref), 15, 2)) AS INT) % 2
              AS INT) AS n_channels,
         CAST(500 + CAST(('0x' || substr(md5(media_ref), 9, 2)) AS INT) * 7
              AS INT) AS n_samples,
         CAST(1000 + CAST(('0x' || substr(md5(media_ref), 11, 2)) AS INT) * 8
              AS INT) AS amp,
         CAST(8 + CAST(('0x' || substr(md5(media_ref), 13, 2)) AS INT) % 24
              AS INT) AS half
  FROM g{where}
)"""


def media_audio_features_oracle_sql(path: str) -> str:
    """DuckDB twin of q_media_audio_features: the md5-derived synthesis
    parameters (multimodal.synth_audio_params restated) pin every
    feature in closed form — a square wave's RMS and peak are its
    amplitude, and its sign flips are (n-1) // half_period."""
    return _media_cte(path) + _audio_params_cte() + """
SELECT media_ref, CAST(sample_rate AS INT) AS sample_rate, n_channels,
       n_samples,
       CAST(n_samples * 1000 // sample_rate AS INT) AS duration_ms,
       amp AS peak, amp AS rms,
       CAST((n_samples - 1) // half AS INT) AS zero_crossings
FROM a
"""


def media_audio_formats_oracle_sql(path: str) -> str:
    """DuckDB twin of q_media_audio_formats: the md5 codec CASE
    (multimodal.synth_audio_codec restated) plus the SAME closed-form
    square-wave features as media_audio_features — every codec in the
    mix is exact for int16 sources, so one feature arithmetic covers
    the whole corpus and the codec column pins the byte-level format
    dispatch."""
    return _media_cte(path) + _audio_params_cte() + """
SELECT media_ref,
       (CASE CAST(('0x' || substr(md5(media_ref), 17, 2)) AS INT) % 4
             WHEN 0 THEN 'pcm16' WHEN 1 THEN 'pcm24'
             WHEN 2 THEN 'float32' ELSE 'extensible/pcm16' END) AS codec,
       CAST(sample_rate AS INT) AS sample_rate, n_channels, n_samples,
       CAST(n_samples * 1000 // sample_rate AS INT) AS duration_ms,
       amp AS peak, amp AS rms,
       CAST((n_samples - 1) // half AS INT) AS zero_crossings
FROM a
"""


def media_audio_g711_oracle_sql(path: str) -> str:
    """DuckDB twin of q_media_audio_g711: the md5 law pick plus the
    G.711 reconstruction-level arithmetic itself — mu-law
    ((8m+132) << e) - 132, A-law 16m+8 / (16m+264) << (e-1) — restated
    as the amplitude (multimodal.synth_audio_g711_params), feeding the
    shared closed-form square-wave features. A hash match proves the
    8-bit compander decodes these levels bit-exactly."""
    return _media_cte(path) + _audio_params_cte() + """
, g711 AS (
  SELECT a.*,
         (CASE WHEN CAST(('0x' || substr(md5(media_ref), 19, 2)) AS INT)
                    % 2 = 0 THEN 'ulaw' ELSE 'alaw' END) AS law,
         CAST(('0x' || substr(md5(media_ref), 21, 2)) AS INT) % 8 AS e,
         1 + CAST(('0x' || substr(md5(media_ref), 23, 2)) AS INT) % 15 AS m
  FROM a
),
lv AS (
  SELECT *,
         CAST(CASE WHEN law = 'ulaw'
                   THEN (8 * m + 132) * (1 << e) - 132
                   WHEN e = 0 THEN 16 * m + 8
                   ELSE (16 * m + 264) * (1 << (e - 1)) END
              AS INT) AS lvl
  FROM g711
)
SELECT media_ref, law AS codec,
       CAST(sample_rate AS INT) AS sample_rate, n_channels, n_samples,
       CAST(n_samples * 1000 // sample_rate AS INT) AS duration_ms,
       lvl AS peak, lvl AS rms,
       CAST((n_samples - 1) // half AS INT) AS zero_crossings
FROM lv
"""


def media_audio_adpcm_oracle_sql(path: str) -> str:
    """DuckDB twin of q_media_audio_adpcm: the md5-derived block
    geometry (multimodal.synth_audio_adpcm_params restated — block_align
    -> samples_per_block -> fact sample count) and the exact feature
    triple the block-aligned square wave pins (peak == rms == amp,
    zero_crossings == n_blocks - 1)."""
    return _media_cte(path) + """
, p AS (
  SELECT media_ref,
         (CASE CAST(('0x' || substr(md5(media_ref), 7, 2)) AS INT) % 4
               WHEN 0 THEN 8000 WHEN 1 THEN 16000
               WHEN 2 THEN 22050 ELSE 44100 END) AS sample_rate,
         CAST(1000 + CAST(('0x' || substr(md5(media_ref), 11, 2)) AS INT) * 8
              AS INT) AS amp,
         (CASE CAST(('0x' || substr(md5(media_ref), 17, 2)) AS INT) % 3
               WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 256 END) AS block_align,
         CAST(2 + CAST(('0x' || substr(md5(media_ref), 19, 2)) AS INT) % 5
              AS INT) AS n_blocks,
         CAST(1 + CAST(('0x' || substr(md5(media_ref), 25, 2)) AS INT) % 2
              AS INT) AS ch
  FROM g
),
q AS (
  SELECT *, CAST((block_align // ch - 4) * 2 + 1 AS INT) AS spb FROM p
)
SELECT media_ref, 'ima-adpcm' AS codec, spb AS samples_per_block,
       CAST(sample_rate AS INT) AS sample_rate, ch AS n_channels,
       CAST(n_blocks * spb AS INT) AS n_samples,
       CAST(n_blocks * spb * 1000 // sample_rate AS INT) AS duration_ms,
       amp AS peak, amp AS rms,
       CAST(n_blocks - 1 AS INT) AS zero_crossings
FROM q
"""


def media_video_frames_quarantine_oracle_sql(
    path: str, n_frames: int = 3
) -> str:
    """DuckDB twin of q_media_video_frames_quarantine: clean refs emit
    exactly the media_video_frames surface; md5-nibble-0 refs (their
    RIFF container truncated in Spark SQL) collapse to ONE null-frame
    quarantine row with ok=false."""
    return _media_cte(path) + f"""
, v AS (
  SELECT media_ref, width, height,
         CAST(2 + CAST(('0x' || substr(md5(media_ref), 5, 2)) AS INT) % 7
              AS INT) AS n_src
  FROM g
  WHERE substr(md5(media_ref), 1, 1) <> '0'
),
s AS (SELECT *, LEAST({n_frames}, n_src) AS kk FROM v)
SELECT media_ref,
       CAST(t.i AS INT) AS frame_idx,
       CAST(CASE WHEN kk <= 1 THEN 0
                 ELSE (2 * t.i * (n_src - 1) + (kk - 1)) // (2 * (kk - 1))
            END AS INT) AS src_idx,
       n_src AS n_src_frames, width, height, TRUE AS ok
FROM s, UNNEST(range(0, kk)) AS t(i)
UNION ALL
SELECT media_ref, CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
       CAST(NULL AS INT), CAST(NULL AS INT), FALSE
FROM g WHERE substr(md5(media_ref), 1, 1) = '0'
"""


def media_audio_quarantine_oracle_sql(path: str) -> str:
    """DuckDB twin of q_media_audio_quarantine: clean refs carry the
    closed-form md5 feature surface, corrupt refs null features +
    ok=false."""
    return _media_cte(path) + _audio_params_cte(
        "\n  WHERE substr(md5(media_ref), 1, 1) <> '0'"
    ) + """
SELECT media_ref, CAST(sample_rate AS INT) AS sample_rate, n_channels,
       n_samples,
       CAST(n_samples * 1000 // sample_rate AS INT) AS duration_ms,
       amp AS peak, amp AS rms,
       CAST((n_samples - 1) // half AS INT) AS zero_crossings,
       TRUE AS ok
FROM a
UNION ALL
SELECT media_ref, CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
       CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
       CAST(NULL AS INT), FALSE
FROM g WHERE substr(md5(media_ref), 1, 1) = '0'
"""


def media_metadata_quarantine_oracle_sql(path: str) -> str:
    """DuckDB twin of q_media_metadata_quarantine: the corruption rule
    (md5 leading nibble '0' -> payload truncated to 10 bytes) is pure
    md5 arithmetic, so the oracle states exactly which rows must be
    quarantined (null dims, ok=false, 10 surviving bytes) and which must
    decode normally."""
    return _media_cte(path) + f"""
SELECT media_ref,
       'bmp' AS format,
       CAST(CASE WHEN substr(md5(media_ref), 1, 1) = '0'
                 THEN 10 ELSE {_BMP_BYTES_SQL} END AS BIGINT) AS n_bytes,
       CAST(CASE WHEN substr(md5(media_ref), 1, 1) = '0'
                 THEN NULL ELSE width END AS INT) AS width,
       CAST(CASE WHEN substr(md5(media_ref), 1, 1) = '0'
                 THEN NULL ELSE height END AS INT) AS height,
       substr(md5(media_ref), 1, 1) <> '0' AS ok
FROM g
"""


def metrics_oracle_sql(path: str) -> str:
    """DuckDB equivalent of pipeline.metrics over the extraction output."""
    return _extract_cte(path) + """
SELECT doc_id,
       COUNT(*) AS spans_emitted,
       CAST(SUM(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)
         AS text_blocks,
       CAST(SUM(CASE WHEN kind <> 'text' THEN 1 ELSE 0 END) AS BIGINT)
         AS media_blocks
FROM extracted
GROUP BY doc_id
"""
