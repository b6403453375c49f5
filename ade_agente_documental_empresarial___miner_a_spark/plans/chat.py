"""E2 chat orchestration — the reference's main Q&A loop
(``micro-infobot/app.py:214-283``) as an engine composite.

retrieve (K1) → context fold (T6) → prompt assembly (T7, history replay
included) → LLM call → persist turn (S6) + cost row (A5). The LLM step is
orchestration, not engine (SURVEY §3 E2): it is injected as a callable;
the default is a deterministic extractive stub (first sentences of the
context) so the whole loop is hermetic and testable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.embedding import embed_one
from ..operators.serving import RamServingIndex
from ..operators.similarity import topk_similar
from ..sources.sinks import (
    _FOOTER_MISS,
    _footer_user_tail,
    _is_local_store,
    append_chat_history,
    chat_store_exists,
    read_chat_history,
)

SYSTEM_PROMPT = (
    "Eres InfoBot, asistente documental de la empresa. Responde usando "
    "únicamente el contexto proporcionado."  # app.py:23-40 role
)

# app.py:276 cost model
PROMPT_TOKEN_USD = 0.00001
COMPLETION_TOKEN_USD = 0.00003

# Default replay cap. The reference replays the ENTIRE per-user history
# every turn (ConversationBufferMemory, app.py:228-242) — at 100× chat
# volume that is an unbounded driver-side collect and an OOM. The engine
# default is therefore a bounded window (cap applied BEFORE collect, so
# driver materialization is O(cap) regardless of stored depth); full
# replay stays available as the explicit parity mode via
# ``last_n_turns=None``.
DEFAULT_LAST_N_TURNS = 50


def extractive_stub_llm(messages: list[dict]) -> str:
    """Deterministic 'LLM': answer = first two sentences of the context
    block (the trailing system message)."""
    context = ""
    for m in reversed(messages):
        if m["role"] == "system" and m is not messages[0]:
            context = m["content"]
            break
    sentences = [s.strip() for s in context.split(".") if s.strip()]
    if not sentences:
        return "No hay información relevante."  # app.py:224 fallback
    return ". ".join(sentences[:2]) + "."


@dataclass
class ChatTurn:
    answer: str
    context: str
    messages: list[dict]
    prompt_tokens: int
    completion_tokens: int
    cost_usd: float


def answer_question(
    spark: SparkSession,
    chunks: DataFrame | RamServingIndex,
    user: str,
    question: str,
    history_path: str | None = None,
    k: int = 4,
    dim: int = 64,
    llm: Callable[[list[dict]], str] = extractive_stub_llm,
    last_n_turns: int | None = DEFAULT_LAST_N_TURNS,
) -> ChatTurn:
    """One full E2 turn against a built chunks index.

    ``last_n_turns`` defaults to ``DEFAULT_LAST_N_TURNS`` (50): only the
    n most recent turns are replayed, and the cap is applied BEFORE
    collect (orderBy desc + limit → per-partition top-n heaps), so the
    driver-side materialization is O(n) no matter how long the stored
    history gets. ``last_n_turns=None`` is the explicit PARITY mode: it
    replays the ENTIRE per-user history each turn — the reference's
    ConversationBufferMemory behavior (app.py:228-242) — and grows
    without bound, so it is opt-in rather than the default.
    """
    past = (
        _load_past(spark, history_path, user, last_n_turns)
        if history_path
        else []
    )
    return _run_turn(
        spark, chunks, user, question, past, history_path, k, dim, llm
    )


def _load_past(
    spark: SparkSession,
    history_path: str,
    user: str,
    last_n_turns: int | None,
) -> list[tuple[str, str]]:
    """Replay tail from the store as (message, response) pairs in turn
    order (T7 history replay, app.py:228-242)."""
    # only the first-turn missing-history path may be empty; a transient
    # read failure must surface (same contract as sinks._next_turn_id,
    # and same silent fs.exists probe — see chat_store_exists).
    if not chat_store_exists(spark, history_path):
        return []
    if last_n_turns is not None and _is_local_store(spark, history_path):
        # r11: driver-local stores serve the bounded tail from footer-
        # pruned pyarrow reads (newest files until the user's top-n rows
        # by (ts, turn_id) are provably covered) — zero Spark jobs, work
        # O(covering files) not O(history); anything unprovable (nested
        # layout, NULL keys, foreign schema) falls back to the exact
        # Spark read below. Equivalence pinned by
        # tests/test_chat_session.py::test_footer_user_tail_matches_spark.
        tail_rows = _footer_user_tail(history_path, user, last_n_turns)
        if tail_rows is not _FOOTER_MISS:
            return tail_rows
    hist = read_chat_history(spark, history_path).where(
        F.col("user") == user
    )
    if last_n_turns is not None:
        # turn_id breaks same-timestamp ties deterministically
        # (matching the stable full-replay order below)
        tail = hist.orderBy(
            F.desc("ts"), F.desc_nulls_last("turn_id")
        ).limit(last_n_turns)
        past = sorted(
            tail.collect(),
            key=lambda r: (r.ts, r.turn_id if r.turn_id is not None else -1),
        )
    else:
        past = hist.orderBy(
            "ts", F.asc_nulls_first("turn_id")
        ).collect()
    return [(t.message, t.response) for t in past]


def _run_turn(
    spark: SparkSession,
    chunks: DataFrame | RamServingIndex,
    user: str,
    question: str,
    past: list[tuple[str, str]],
    history_path: str | None,
    k: int,
    dim: int,
    llm: Callable[[list[dict]], str],
    base_turn_id: int | None = None,
) -> ChatTurn:
    """The turn core shared by the stateless path and ``ChatSession``:
    retrieve (K1) → context fold (T6) → prompt assembly over ``past``
    (T7) → LLM → persist (S6). ``past`` is the replay buffer however it
    was sourced — from the store (``answer_question``) or from RAM
    (``ChatSession``) — so the two modes assemble byte-identical
    prompts for the same history."""
    qvec = embed_one(question, dim=dim)
    # K1 retrieval, two physical tiers with bit-identical results
    # (operators/serving.py, pinned by tests/test_serving_ram.py):
    # a DataFrame index runs the distributed TakeOrderedAndProject
    # plan; a RamServingIndex answers driver-side with zero Spark
    # jobs — the reference's client-side Chroma query (app.py:223).
    if isinstance(chunks, RamServingIndex):
        hits = chunks.topk(qvec, k=k)
    else:
        hits = topk_similar(chunks, qvec, k=k).collect()
    context = "\n".join(r.text for r in hits)  # T6 app.py:224

    messages = [{"role": "system", "content": SYSTEM_PROMPT}]
    for msg, resp in past:
        messages.append({"role": "user", "content": msg})
        messages.append({"role": "assistant", "content": resp})
    messages.append({"role": "user", "content": question})
    if context:
        messages.append({"role": "system", "content": context})

    answer = llm(messages)

    # token accounting: whitespace-token estimate (tiktoken stand-in)
    prompt_tokens = sum(len(m["content"].split()) for m in messages)
    completion_tokens = len(answer.split())
    cost = (
        prompt_tokens * PROMPT_TOKEN_USD
        + completion_tokens * COMPLETION_TOKEN_USD
    )

    if history_path:  # S6 persist (app.py:258)
        append_chat_history(
            spark,
            [(user, question, answer, None, prompt_tokens, completion_tokens)],
            history_path,
            base_turn_id=base_turn_id,
        )
    return ChatTurn(
        answer=answer,
        context=context,
        messages=messages,
        prompt_tokens=prompt_tokens,
        completion_tokens=completion_tokens,
        cost_usd=cost,
    )


class ChatSession:
    """Stateful serving session — the reference's actual runtime shape.

    In the reference the conversation memory is RAM-resident
    (``st.session_state.memory``, a ConversationBufferMemory,
    app.py:43-44 / 228-242) and Mongo is WRITE-only per turn
    (``guardar_chat_en_mongo``, app.py:258): the store is an audit log,
    not the serving path. ``answer_question`` models the stateless tier
    — reconstruct the prompt from the store every turn — which a
    multi-process deployment needs, but it pays two extra Spark jobs
    per turn (history-tail read + turn-counter read-before-write). A
    live session holds both in RAM: the replay buffer is appended
    in-process and the persisted ``turn_id`` counter is read once at
    construction and advanced locally (single-writer append, the same
    assumption ``sinks.append_chat_history`` documents). A turn then
    costs exactly ONE Spark job — the retrieval collect; the append is
    a driver-side Arrow write (``sinks._arrow_append``, the engine
    analogue of the reference's client-side insert_one) — and yields
    byte-identical prompts, answers, and persisted rows to the
    stateless loop (pinned by tests/test_chat_session.py and the
    sink equivalence battery).

    Passing a ``RamServingIndex`` as ``chunks`` drops the remaining
    job: retrieval answers driver-side from the bounded RAM index
    (bit-identical hits — operators/serving.py), so a turn runs ZERO
    Spark jobs, the reference's actual per-turn profile (client-side
    Chroma query + client-side insert_one). The distributed DataFrame
    tier remains the default and the multi-process/unbounded path.
    """

    def __init__(
        self,
        spark: SparkSession,
        chunks: DataFrame | RamServingIndex,
        user: str,
        history_path: str | None = None,
        k: int = 4,
        dim: int = 64,
        llm: Callable[[list[dict]], str] = extractive_stub_llm,
        last_n_turns: int | None = DEFAULT_LAST_N_TURNS,
    ) -> None:
        from ..sources.sinks import _next_turn_id

        self._spark = spark
        self._chunks = chunks
        self._user = user
        self._history_path = history_path
        self._k = k
        self._dim = dim
        self._llm = llm
        self._last_n_turns = last_n_turns
        # one store read each at construction (zero when no store):
        # resume the replay buffer and the persisted turn counter from
        # whatever a previous session left behind
        self._buffer: list[tuple[str, str]] = (
            _load_past(spark, history_path, user, last_n_turns)
            if history_path
            else []
        )
        self._next_id = (
            _next_turn_id(spark, history_path) if history_path else 0
        )

    def ask(self, question: str) -> ChatTurn:
        turn = _run_turn(
            self._spark,
            self._chunks,
            self._user,
            question,
            self._buffer,
            self._history_path,
            self._k,
            self._dim,
            self._llm,
            base_turn_id=self._next_id,
        )
        self._next_id += 1
        self._buffer.append((question, turn.answer))
        if self._last_n_turns is not None:
            # keep the RAM buffer at the same bounded window the
            # stateless tier replays, so a turn sees identical history
            # whichever mode served the preceding turns
            self._buffer = self._buffer[-self._last_n_turns :]
        return turn
