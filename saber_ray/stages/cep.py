"""CEP sequence-pattern matching (MATCH_RECOGNIZE-lite).

The north star names this engine a structured-streaming/CEP engine; the
reference has no pattern operator (its CEP surface is windows + joins —
SURVEY.md §2), so this is the engine's own: detect, per key, a SEQUENCE of
per-row predicates over consecutive ordered rows — e.g. a
user → assistant → tool turn sequence inside one conversation, optionally
within a time budget.

Ray-native shape (the session_windows template, stages/session.py:159-218):
ONE null-safe sort co-location exchange on the keys (every key's rows land
whole in one block per Ray's sort-boundary invariant), then a per-block pass
that is fully vectorized: each pattern step's predicate is evaluated ONCE
over the whole block (pyarrow.compute mask), and a match at position i is
the AND of the step masks shifted by their offsets — no per-row or per-key
Python. O(block_rows × pattern_len) with C-level kernels.

Semantics (pinned by the DuckDB LEAD() oracle twin in tests/test_cep.py):
a match starts at every row i where predicate[j] holds on row i+j for all
j, all pattern rows share the key, and (with ``within``) the last row's
timestamp is within ``within`` microseconds of the first's. Matches may
overlap (every starting position reports independently — LEAD semantics);
set ``non_overlapping=True`` for disjoint greedy-from-left matches (the
MATCH_RECOGNIZE SKIP PAST LAST ROW policy), resolved per key with a simple
scan over match STARTS only (bounded by matches, not rows).

Quantifiers: a step may be written ``(pred, "+")`` (one-or-more),
``(pred, "*")`` (zero-or-more) or ``(pred, "?")`` (zero-or-one) —
consecutive rows, GREEDY and POSSESSIVE (a quantified step takes every
consecutive matching row it can and the next step must match AFTER it;
no regex-style backtracking — the same deterministic semantics as
possessive ``B++``/``B*+``/``B?+``, chosen because backtracking would
destroy the vectorized kernel and is rarely what a pipeline means —
e.g. ``(B,'*') (B,'+')`` never matches, because the ``*`` swallows the
whole run). Runs never cross key boundaries; the first step must be
non-optional (a zero-row first step would leave the match start
undefined). The quantified kernel stays fully vectorized: per-step run
lengths come from one ``searchsorted`` over break positions, and
candidate starts advance through the pattern as whole numpy arrays
(O(rows × steps), no per-row Python). Batch-only: the streaming engine
raises on quantified patterns — a greedy run open at the watermark has
unbounded look-ahead, so sealing is impossible without a length bound.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def match_pattern(
    ds,
    pattern: Sequence[Callable[[pa.Table], object]],
    *,
    keys: Sequence[str] | str = ("conv_id",),
    order_by: Sequence[str] | str = ("turn_idx",),
    ts_col: Optional[str] = None,
    within: Optional[int] = None,
    non_overlapping: bool = False,
    columns: Optional[Sequence[str]] = None,
):
    """One output row per detected pattern occurrence.

    ``pattern``: per-step row predicates (engine expressions or any
    ``table -> bool mask`` callable), matched on CONSECUTIVE rows in
    ``order_by`` order per key. ``within`` (requires ``ts_col``): max
    microseconds between first and last matched row.

    Output: key columns + ``match_start_<order>`` / ``match_end_<order>``
    (first order_by column's value at the first/last matched row), plus
    ``match_start_us`` / ``match_end_us`` when ``ts_col`` is given.

    ``columns``: extra input columns required by the predicates (pruned
    read support — defaults to all columns reaching this stage).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    preds, quants = [], []
    for step in pattern:
        if isinstance(step, tuple):
            pred, q = step
            if q not in ("+", "*", "?"):
                raise ValueError(
                    f"unknown quantifier {q!r} (one of '+', '*', '?')")
            preds.append(pred)
            quants.append(q)
        else:
            preds.append(step)
            quants.append(1)
    if not preds:
        raise ValueError("pattern must have at least one step")
    if within is not None and ts_col is None:
        raise ValueError("within requires ts_col")
    has_quant = any(q != 1 for q in quants)
    # minimum rows a match consumes: 1 per plain/'+' step, 0 per '*'/'?'
    min_len = sum(1 for q in quants if q in (1, "+"))
    if min_len == 0:
        raise ValueError("pattern needs at least one non-optional step "
                         "(all-'*'/'?' patterns would match zero rows)")
    if quants[0] not in (1, "+"):
        raise ValueError(
            "the first pattern step must be non-optional ('*'/'?' first "
            "steps would leave the match start undefined when they "
            "consume zero rows)")
    m = min_len
    ord0 = order_by[0]

    from saber_ray.stages.window_agg import _encode_null_keys
    enc, dec, sort_keys = _encode_null_keys(keys)

    need = None if columns is None else list(dict.fromkeys(
        keys + order_by + ([ts_col] if ts_col else []) + list(columns)))

    def prep(t: pa.Table) -> pa.Table:
        return t if need is None else t.select(need)

    def per_block(g: pa.Table) -> pa.Table:
        ord_type = g.schema.field(ord0).type
        out_fields = [(k, g.schema.field(k).type)
                      for k in keys + [f"__nn_{k}" for k in keys]]
        out_fields += [(f"match_start_{ord0}", ord_type),
                       (f"match_end_{ord0}", ord_type)]
        if ts_col:
            out_fields += [("match_start_us", pa.int64()),
                           ("match_end_us", pa.int64())]
        schema = pa.schema(out_fields)
        n = g.num_rows
        if n < m:
            return dec(schema.empty_table())
        order = pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in sort_keys + order_by])
        g = g.take(order).combine_chunks()
        # same-key runs via dictionary codes (string compare stays in C++)
        from saber_ray.core.segments import key_change_mask
        same_key = ~key_change_mask(g, sort_keys)
        rid = np.cumsum(~same_key)            # run id per row
        # step masks, evaluated once over the whole block
        mks = []
        for pred in preds:
            mask = pred(g)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            mks.append(np.asarray(pc.fill_null(mask, False).to_numpy(
                zero_copy_only=False), dtype=bool))
        tus = tvalid = None
        if ts_col is not None:
            tc = g[ts_col].combine_chunks()
            if not pa.types.is_integer(tc.type):
                tc = tc.cast(pa.int64())
            # fill BEFORE to_numpy: a NULL ts must not become NaN (breaks
            # the int64 output build); emit NULL bounds for such matches
            tvalid = pc.is_valid(tc).to_numpy(zero_copy_only=False)
            tus = pc.fill_null(tc, 0).to_numpy(zero_copy_only=False)

        if not has_quant:
            # fixed-length fast path: AND of offset-shifted step masks
            ok = np.ones(n - m + 1, dtype=bool)
            for j, mj in enumerate(mks):
                ok &= mj[j:n - m + 1 + j]
            ok &= rid[:n - m + 1] == rid[m - 1:]   # one key run
            if within is not None:
                # SQL comparison semantics: a NULL ts can never satisfy
                # `end.ts - start.ts <= within`
                ok &= (tus[m - 1:] - tus[:n - m + 1]) <= within
                ok &= tvalid[m - 1:] & tvalid[:n - m + 1]
            starts = np.flatnonzero(ok)
            ends = starts + m - 1
        else:
            # quantified path: every row is a candidate start; candidates
            # advance through the steps as whole arrays. A '+' step
            # consumes its GREEDY run (possessive — no backtracking).
            run_start = np.empty(n, dtype=bool)
            run_start[0] = True
            run_start[1:] = rid[1:] != rid[:-1]
            idx = np.arange(n)

            def runlens(b: np.ndarray) -> np.ndarray:
                # length of the consecutive b-run starting at each row,
                # never crossing a key-run boundary. blocked[j] = a run
                # cannot CONTINUE into j; one searchsorted finds, per i,
                # the first blocked position AFTER i.
                blocked = ~b | run_start
                blocked[0] = True
                stops = np.flatnonzero(blocked)
                nxt = np.searchsorted(stops, idx, side="right")
                j = np.where(nxt < len(stops),
                             stops[np.minimum(nxt, len(stops) - 1)], n)
                return np.where(b, j - idx, 0)

            cur = idx.copy()
            alive = np.ones(n, dtype=bool)
            for mk, q in zip(mks, quants):
                inb = cur < n
                safe = np.minimum(cur, n - 1)
                same_run = rid[safe] == rid[idx]
                if q == 1:
                    alive &= inb & mk[safe] & same_run
                    cur = cur + 1
                elif q == "+":
                    ln = runlens(mk)[safe]
                    alive &= inb & (ln >= 1) & same_run
                    cur = cur + np.maximum(ln, 1)
                elif q == "*":
                    # zero-or-more: optional, so never kills a candidate;
                    # consumes its greedy run when present and in-bounds
                    ln = np.where(inb & same_run, runlens(mk)[safe], 0)
                    cur = cur + ln
                else:                      # '?': zero-or-one, possessive
                    take = inb & same_run & mk[safe]
                    cur = cur + take.astype(np.int64)
            ends_all = cur - 1
            ok = alive & (ends_all < n)
            if within is not None:
                e_safe = np.minimum(ends_all, n - 1)
                ok &= (tus[e_safe] - tus[idx]) <= within
                ok &= tvalid[e_safe] & tvalid[idx]
            starts = np.flatnonzero(ok)
            ends = ends_all[starts]

        if non_overlapping and len(starts) > 1:
            # greedy from the left per key: drop starts inside the previous
            # accepted match — scan over match STARTS only
            keep_s, keep_e, last_end, last_rid = [], [], -1, -1
            for s, e in zip(starts, ends):
                if rid[s] != last_rid or s > last_end:
                    keep_s.append(s)
                    keep_e.append(e)
                    last_end, last_rid = e, rid[s]
            starts = np.asarray(keep_s, dtype=np.int64)
            ends = np.asarray(keep_e, dtype=np.int64)
        if not len(starts):
            return dec(schema.empty_table())
        cols: list = [g[k].combine_chunks().take(pa.array(starts))
                      for k in keys + [f"__nn_{k}" for k in keys]]
        ocol = g[ord0].combine_chunks()
        cols += [ocol.take(pa.array(starts)), ocol.take(pa.array(ends))]
        if ts_col:
            cols += [pa.array(tus[starts], type=pa.int64(),
                              mask=~tvalid[starts]),
                     pa.array(tus[ends], type=pa.int64(),
                              mask=~tvalid[ends])]
        return dec(pa.Table.from_arrays(cols, schema=schema))

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(enc, batch_format="pyarrow", zero_copy_batch=True) \
        .sort(sort_keys) \
        .map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True)
