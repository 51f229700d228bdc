"""SRT / WebVTT subtitle extraction — the video-transcript slice.

Subtitle files are where a multimodal corpus gets its spoken-word
text (every captioned video ships one), and the two wire formats
cover essentially all of it: SubRip ``.srt`` (numbered cues,
``HH:MM:SS,mmm`` comma timestamps) and WebVTT (``WEBVTT`` header,
dot timestamps, optional cue ids/settings, inline ``<v>``/``<i>``
styling tags, ``NOTE`` comment blocks).

The whole parse is scan-level JVM: normalize newlines, split into
blank-line-separated blocks, ``filter`` to the blocks containing a
``-->`` timing line (this drops the WEBVTT header, NOTE blocks and
stray numbering in one move — and makes ``cue_idx`` exact without a
window), ``posexplode``, then regexp-extract the two timestamps
(hours optional, comma or dot millis — one pattern reads both
formats) and strip everything up to the timing line plus any inline
tags.  Zero Python, zero shuffle.

Timestamps come out as integer milliseconds — exact, so the oracle
hash-matches without float games.  A blob with no timing lines
contributes zero rows (the triage law).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["subtitle_cues", "CUE_TIMING"]

#: both wire formats' timing line: optional hours, comma (SRT) or
#: dot (VTT) millisecond separator, optional VTT cue settings after
#: the end time.  Groups: 1-4 start (h,m,s,ms), 5-8 end.
CUE_TIMING = (r"(?:(\d+):)?(\d{2}):(\d{2})[.,](\d{3})[ \t]*-->"
              r"[ \t]*(?:(\d+):)?(\d{2}):(\d{2})[.,](\d{3})")


def _ms(block: Column, h: int, m: int, s: int, ms: int) -> Column:
    """Assemble integer milliseconds from the four timing groups
    (empty optional-hours group reads as 0)."""
    def g(idx):
        return F.coalesce(
            F.regexp_extract(block, CUE_TIMING, idx)
             .try_cast("long"), F.lit(0))
    return ((g(h) * 3600 + g(m) * 60 + g(s)) * 1000 + g(ms))


def subtitle_cues(df: DataFrame, content_col: str = "content",
                  id_col: str = "doc_id") -> DataFrame:
    """One row per cue: ``(id, fmt, cue_idx, start_ms, end_ms,
    text)`` — SRT and WebVTT on the same columns, cue text with
    inline styling tags stripped and internal newlines kept."""
    raw = F.regexp_replace(F.col(content_col), r"\r\n?", "\n")
    fmt = F.when(raw.startswith("WEBVTT"), "vtt").otherwise("srt")
    cues = F.filter(F.split(raw, r"\n\n+"),
                    lambda b: b.contains("-->"))
    base = df.select(
        F.col(id_col), fmt.alias("fmt"),
        F.posexplode(cues).alias("cue_idx", "block"))
    block = F.col("block")
    text = F.regexp_replace(block, r"(?s)^.*?-->[^\n]*\n?", "")
    text = F.regexp_replace(text, r"<[^>\n]*>", "")
    text = F.regexp_replace(text, r"\n+$", "")
    return base.select(
        id_col, "fmt", "cue_idx",
        _ms(block, 1, 2, 3, 4).alias("start_ms"),
        _ms(block, 5, 6, 7, 8).alias("end_ms"),
        text.alias("text"))
