"""E2 chat composite tests — hermetic full loop with the stub LLM."""

from ade_agente_documental_empresarial___miner_a_spark.plans.chat import (
    answer_question,
)
from ade_agente_documental_empresarial___miner_a_spark.plans.pipeline import (
    build_chunks,
)


def make_index(spark):
    docs = spark.createDataFrame(
        [
            (1, "SPARK TUNING\n\nbroadcast small tables. avoid shuffles"),
            (2, "COST MODEL\n\nprompt tokens cost less than completion tokens"),
        ],
        "doc_id long, text string",
    )
    return build_chunks(docs)


def test_full_turn_retrieves_and_answers(spark, tmp_path):
    chunks = make_index(spark)
    turn = answer_question(
        spark, chunks, "ana", "how do I tune spark joins",
        history_path=str(tmp_path / "chat"),
    )
    assert turn.context  # retrieved something
    assert turn.answer.endswith(".")
    assert turn.messages[0]["role"] == "system"
    assert turn.messages[-1]["role"] == "system"  # trailing context msg
    assert turn.prompt_tokens > 0 and turn.completion_tokens > 0
    assert abs(
        turn.cost_usd
        - (turn.prompt_tokens * 1e-5 + turn.completion_tokens * 3e-5)
    ) < 1e-12


def test_history_replay_grows_prompt(spark, tmp_path):
    chunks = make_index(spark)
    path = str(tmp_path / "chat")
    t1 = answer_question(spark, chunks, "ana", "first question", history_path=path)
    t2 = answer_question(spark, chunks, "ana", "second question", history_path=path)
    # second turn replays turn 1 as user+assistant messages (T7)
    assert len(t2.messages) == len(t1.messages) + 2
    roles = [m["role"] for m in t2.messages]
    assert roles[1] == "user" and roles[2] == "assistant"


def test_empty_index_fallback(spark):
    empty = make_index(spark).where("doc_id = 999")
    turn = answer_question(spark, empty, "ana", "anything")
    assert turn.answer == "No hay información relevante."
    assert turn.context == ""


def test_determinism(spark):
    chunks = make_index(spark)
    a = answer_question(spark, chunks, "ana", "cost of tokens")
    b = answer_question(spark, chunks, "ana", "cost of tokens")
    assert a.answer == b.answer and a.context == b.context


def test_last_n_turns_bounds_replay(spark, tmp_path):
    """With last_n_turns=2 only the 2 most recent turns are replayed
    (chronological order preserved); last_n_turns=None is the explicit
    full-replay parity mode (the bounded window is the default)."""
    from ade_agente_documental_empresarial___miner_a_spark.sources.sinks import (
        append_chat_history,
    )
    import datetime as dt

    path = str(tmp_path / "chat")
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("ana", f"q{i}", f"a{i}", base + dt.timedelta(minutes=i), 3, 2)
        for i in range(5)
    ]
    append_chat_history(spark, rows, path)
    chunks = make_index(spark)

    bounded = answer_question(
        spark, chunks, "ana", "final question",
        history_path=path, last_n_turns=2,
    )
    replayed = [m["content"] for m in bounded.messages if m["role"] == "user"]
    assert replayed == ["q3", "q4", "final question"]  # oldest dropped, order kept

    full = answer_question(
        spark, chunks, "ana", "another question", history_path=path,
        last_n_turns=None,
    )
    full_user = [m["content"] for m in full.messages if m["role"] == "user"]
    # full replay now includes the 5 seeded + the bounded turn just persisted
    assert full_user[:5] == ["q0", "q1", "q2", "q3", "q4"]
    assert "final question" in full_user


def test_bounded_replay_is_o_n_over_long_history(spark, tmp_path):
    """Regression guard for the bounded path: over a ~50-turn history the
    last_n_turns prompt must be IDENTICAL in size to the same tail over a
    10-turn history (O(n) in the cap, O(1) in stored history), while
    full replay (the reference's ConversationBufferMemory parity mode,
    app.py:228-242) grows linearly with every stored turn."""
    import datetime as dt

    from ade_agente_documental_empresarial___miner_a_spark.sources.sinks import (
        append_chat_history,
    )

    chunks = make_index(spark)
    base = dt.datetime(2026, 1, 1, 12, 0, 0)

    def seed(path, n):
        append_chat_history(
            spark,
            [
                ("ana", f"q{i:03d}", f"a{i:03d}", base + dt.timedelta(minutes=i), 3, 2)
                for i in range(n)
            ],
            path,
        )

    short, long = str(tmp_path / "short"), str(tmp_path / "long")
    seed(short, 10)
    seed(long, 50)

    b_short = answer_question(
        spark, chunks, "ana", "Q", history_path=short, last_n_turns=3
    )
    b_long = answer_question(
        spark, chunks, "ana", "Q", history_path=long, last_n_turns=3
    )
    # bounded: same message count and same token bill regardless of depth
    assert len(b_long.messages) == len(b_short.messages)
    replayed = [m["content"] for m in b_long.messages if m["role"] == "user"]
    assert replayed[:3] == ["q047", "q048", "q049"]

    f_short = answer_question(
        spark, chunks, "ana", "Q", history_path=short, last_n_turns=None
    )
    f_long = answer_question(
        spark, chunks, "ana", "Q", history_path=long, last_n_turns=None
    )
    # full replay (explicit parity mode): grows with stored history.
    # Each history now also carries the bounded turn appended above, so
    # depths are 11 vs 51 — the delta is still the seeded 40-turn gap.
    assert len(f_long.messages) - len(f_short.messages) == 2 * (51 - 11)


def test_default_is_bounded_window(spark, tmp_path):
    """The DEFAULT replay mode is the bounded 50-turn window (100 TB
    posture: driver materialization O(cap), not O(stored history));
    full replay requires explicit last_n_turns=None."""
    import datetime as dt

    from ade_agente_documental_empresarial___miner_a_spark.plans.chat import (
        DEFAULT_LAST_N_TURNS,
    )
    from ade_agente_documental_empresarial___miner_a_spark.sources.sinks import (
        append_chat_history,
    )

    assert DEFAULT_LAST_N_TURNS == 50
    path = str(tmp_path / "chat")
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    append_chat_history(
        spark,
        [
            ("ana", f"q{i:03d}", f"a{i:03d}", base + dt.timedelta(minutes=i), 1, 1)
            for i in range(55)
        ],
        path,
    )
    chunks = make_index(spark)
    turn = answer_question(spark, chunks, "ana", "Q", history_path=path)
    replayed = [m["content"] for m in turn.messages if m["role"] == "user"]
    # 50 replayed + the live question; oldest 5 turns dropped
    assert len(replayed) == DEFAULT_LAST_N_TURNS + 1
    assert replayed[0] == "q005" and replayed[49] == "q054"

    full = answer_question(
        spark, chunks, "ana", "Q", history_path=path, last_n_turns=None
    )
    full_replayed = [m["content"] for m in full.messages if m["role"] == "user"]
    assert len(full_replayed) == 56 + 1  # 55 seeded + bounded turn above + live


def test_same_ts_ties_break_on_turn_id(spark, tmp_path):
    """All turns sharing ONE timestamp: the bounded tail must still be the
    most recently appended turns, in append order, on every run."""
    import datetime as dt

    from ade_agente_documental_empresarial___miner_a_spark.sources.sinks import (
        append_chat_history,
    )

    ts = dt.datetime(2026, 1, 1, 12, 0, 0)
    chunks = make_index(spark)
    for run in range(3):  # stable across repeated executions
        path = str(tmp_path / f"chat{run}")
        append_chat_history(
            spark,
            [("ana", f"q{i}", f"a{i}", ts, 1, 1) for i in range(6)],
            path,
        )
        turn = answer_question(
            spark, chunks, "ana", "Q", history_path=path, last_n_turns=2
        )
        replayed = [m["content"] for m in turn.messages if m["role"] == "user"]
        assert replayed[:2] == ["q4", "q5"]
