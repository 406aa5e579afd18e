"""SFT training-pair assembly from conversation transcripts.

The transcripts table IS the raw material of supervised fine-tuning; the
missing step between "validated transcripts" and "training data" is
pairing each assistant turn with its preceding dialogue context. This
module does that as ONE conv-keyed window pass — the same single
exchange sessionization and the sequence checks ride.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sft_pairs(
    transcripts: DataFrame,
    assistant_role: str = "assistant",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    sep: str = "\n",
    max_context_turns: int | None = None,
    max_context_chars: int | None = None,
) -> DataFrame:
    """(conv_id, turn_idx, prompt, response) for every assistant turn
    with text: response = the turn's text, prompt = all PRECEDING turns
    rendered ``role: text`` and joined with ``sep``, in the pinned
    intra-conversation order (turn_idx, ts, role, text, tool — the
    sequence-check tuple, NULLS LAST via coalesce so both engines sort
    identically). First-turn assistant rows (empty context) are dropped
    — a response with no prompt is not a training pair.

    Scale: ONE exchange on the conversation key; the running context is
    a window collect_list over the sorted frame (per-conversation work
    linear in turns, bounded by conversation length like sessionize —
    a whale conversation is one task of its own rows, and the rendered
    prompt grows with the conversation, which is inherent to the
    output, not the plan). Rows with NULL turn_idx are excluded, as in
    the sequence checks (that's the required-field check's violation).

    CONTEXT CAPS (every production SFT pipeline truncates context):

    - ``max_context_turns`` bounds the window frame itself —
      ``ROWS BETWEEN max PRECEDING AND 1 PRECEDING`` — so a whale
      conversation's task materializes O(turns * cap) characters
      instead of O(turns²): without it one 10M-turn conversation
      makes a single task build gigabytes of running prompt.
    - ``max_context_chars`` keeps the LAST that many characters of the
      rendered prompt (the most recent context — the end of the prompt
      is what abuts the response). Applied after the turn cap; a pure
      post-projection, so it bounds OUTPUT size, while the turn cap is
      what bounds the window's working set.

    Both default to None (uncapped, the original contract output).
    """
    if max_context_turns is not None and max_context_turns < 1:
        # 0 would build the invalid frame ROWS BETWEEN 0 PRECEDING AND 1
        # PRECEDING (lo > hi); a no-context pair is not a pair anyway
        raise ValueError("max_context_turns must be >= 1 (or None)")
    if max_context_chars is not None and max_context_chars < 1:
        raise ValueError("max_context_chars must be >= 1 (or None)")
    line = F.concat(
        F.coalesce(F.col("role"), F.lit("")),
        F.lit(": "),
        F.coalesce(F.col("text"), F.lit("")),
    )
    lo = (
        Window.unboundedPreceding
        if max_context_turns is None
        else -int(max_context_turns)
    )
    w = (
        Window.partitionBy(conv_col)
        .orderBy(
            F.col(idx_col).asc_nulls_last(),
            F.col("ts").asc_nulls_last(),
            F.coalesce(F.col("role"), F.lit("")).asc(),
            F.coalesce(F.col("text"), F.lit("")).asc(),
            F.coalesce(F.col("tool"), F.lit("")).asc(),
        )
        .rowsBetween(lo, -1)
    )
    prompt = F.concat_ws(sep, F.collect_list(line).over(w))
    if max_context_chars is not None:
        # keep the TAIL (most recent context); substr is 1-based and
        # clamps, so short prompts pass through unchanged
        n = int(max_context_chars)
        prompt = F.when(
            F.length(prompt) > n, F.substring(prompt, -n, n)
        ).otherwise(prompt)
    return (
        transcripts.filter(F.col(idx_col).isNotNull())
        .select(
            F.col(conv_col).alias("conv_id"),
            F.col(idx_col).alias("turn_idx"),
            F.col("role"),
            F.col("text"),
            prompt.alias("prompt"),
        )
        .filter(
            (F.col("role") == assistant_role)
            & F.col("text").isNotNull()
            & (F.col("prompt") != "")
        )
        .select("conv_id", "turn_idx", "prompt", F.col("text").alias("response"))
    )


def preference_pairs(
    transcripts: DataFrame,
    assistant_role: str = "assistant",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """(conv_id, turn_idx, rejected, chosen) — preference-pair mining
    from REGENERATED responses: when a conversation holds more than one
    assistant turn at the SAME turn index (this repo's transcripts
    inject exactly that via the duplicate-turn_idx violation — in real
    pipelines a duplicated slot is a resampled response), consecutive
    responses form a DPO-style pair. Convention (documented, arbitrary):
    ``chosen`` is the LATER response in the pinned order — the
    regeneration that superseded its predecessor; ``rejected`` the
    earlier.

    Rules both engines state identically: only ``assistant_role`` turns
    with non-NULL text participate (a NULL response cannot be preferred
    or rejected); rows with NULL turn_idx are excluded (the required
    check's violation, as in sft_pairs); in-group order is the total key
    (ts, text, tool) with NULLS LAST — rows tied on all three are
    output-identical, so their order cannot matter.

    Scale: ONE exchange keyed (conv, turn_idx); CONSECUTIVE pairing via
    lag is linear in group size (an adversarial slot with k regens emits
    k-1 pairs, never k²/2 — the whale-safe shape), and the window's
    partition key extends the conversation key, so downstream
    conversation-level consumers reuse the exchange.
    """
    base = transcripts.filter(
        (F.col("role") == F.lit(assistant_role))
        & F.col("text").isNotNull()
        & F.col(idx_col).isNotNull()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy(conv_col, idx_col).orderBy(
        F.coalesce(us, F.lit(2**63 - 1)).asc(),
        F.col("text").asc_nulls_last(),
        F.col("tool").asc_nulls_last(),
    )
    prev_text = F.lag("text").over(w)
    return (
        base.select(
            F.col(conv_col),
            F.col(idx_col).cast("long").alias(idx_col),
            prev_text.alias("rejected"),
            F.col("text").alias("chosen"),
        )
        .filter(F.col("rejected").isNotNull())
    )
