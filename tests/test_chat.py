"""Conversation (SFT/chat) operator tests: parse quarantine, structural
stats/validity, template render, assistant loss spans (property: slicing
the render with the spans recovers exactly the assistant contents), and
per-turn explode round-trip."""

import json

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators import chat as C


def _conv_df(spark, convs):
    rows = [(i, json.dumps(c) if c is not None else None) for i, c in enumerate(convs)]
    return spark.createDataFrame(rows, "conv_id long, conversation string")


GOOD = [
    {"role": "user", "content": "hi there"},
    {"role": "assistant", "content": "hello!"},
]
SYS = [{"role": "system", "content": "be terse"}] + GOOD
MULTI = GOOD + [
    {"role": "user", "content": "and two?"},
    {"role": "assistant", "content": "four"},
]
BAD_DOUBLE_USER = [
    {"role": "user", "content": "a"},
    {"role": "user", "content": "b"},
    {"role": "assistant", "content": "c"},
]
BAD_ENDS_USER = GOOD + [{"role": "user", "content": "unanswered"}]
BAD_ROLE = [
    {"role": "user", "content": "a"},
    {"role": "oracle", "content": "b"},
]


class TestParse:
    def test_parse_and_quarantine(self, spark):
        df = _conv_df(spark, [GOOD, None]).union(
            spark.createDataFrame(
                [(90, "{not json"), (91, '{"role": "user"}')],
                "conv_id long, conversation string",
            )
        )
        out = C.parse_conversations(df).orderBy("conv_id").collect()
        # Spark semantics: a bare JSON OBJECT against an array schema parses
        # as a one-element array (not corrupt) — the structural gate catches
        # it later; only malformed JSON is quarantined
        assert [r["_corrupt"] for r in out] == [False, False, True, False]
        assert out[0]["turns"] == [("user", "hi there"), ("assistant", "hello!")]
        assert out[1]["turns"] is None and not out[1]["_corrupt"]
        assert out[3]["turns"] == [("user", None)]

    def test_extra_keys_ignored(self, spark):
        df = _conv_df(
            spark, [[{"role": "user", "content": "x", "weight": 1.0}] + GOOD[1:]]
        )
        out = C.parse_conversations(df).first()
        assert out["turns"][0] == ("user", "x")


class TestStatsAndFilter:
    def test_stats(self, spark):
        df = C.parse_conversations(_conv_df(spark, [SYS, MULTI]))
        out = C.conversation_stats(df).orderBy("conv_id").collect()
        s, m = out
        assert (s["n_turns"], s["n_user"], s["n_assistant"], s["n_system"]) == (3, 1, 1, 1)
        assert s["first_role"] == "system" and s["last_role"] == "assistant"
        assert s["content_chars"] == len("be terse") + len("hi there") + len("hello!")
        assert s["valid_alternation"]
        assert (m["n_turns"], m["n_user"], m["n_assistant"]) == (4, 2, 2)
        assert m["valid_alternation"]

    @pytest.mark.parametrize(
        "conv,ok",
        [
            (GOOD, True),
            (SYS, True),
            (MULTI, True),
            (BAD_DOUBLE_USER, False),
            (BAD_ROLE, False),
            ([{"role": "system", "content": "only"}], False),
            ([{"role": "assistant", "content": "starts wrong"}] * 2, False),
            ([], False),
        ],
    )
    def test_alternation(self, spark, conv, ok):
        df = C.parse_conversations(_conv_df(spark, [conv]))
        assert C.conversation_stats(df).first()["valid_alternation"] is ok

    def test_filter(self, spark):
        convs = [GOOD, SYS, MULTI, BAD_DOUBLE_USER, BAD_ENDS_USER, None]
        df = C.conversation_stats(C.parse_conversations(_conv_df(spark, convs)))
        kept = C.filter_conversations(df).select("conv_id").collect()
        assert sorted(r[0] for r in kept) == [0, 1, 2]
        cap = C.filter_conversations(df, max_turns=3).select("conv_id").collect()
        assert sorted(r[0] for r in cap) == [0, 1]


class TestRenderAndSpans:
    def test_render_default(self, spark):
        df = C.parse_conversations(_conv_df(spark, [GOOD]))
        text = C.render_chat_template(df).first()["text"]
        assert text == "<|user|>hi there<|end|><|assistant|>hello!<|end|>"

    def test_render_markers(self, spark):
        df = C.parse_conversations(_conv_df(spark, [GOOD]))
        text = C.render_chat_template(
            df, open_l="[", open_r="]", close="\n", bos="<s>", eos="</s>"
        ).first()["text"]
        assert text == "<s>[user]hi there\n[assistant]hello!\n</s>"

    @pytest.mark.parametrize("conv", [GOOD, SYS, MULTI, BAD_DOUBLE_USER])
    def test_spans_slice_recovers_assistant_content(self, spark, conv):
        df = C.parse_conversations(_conv_df(spark, [conv]))
        row = C.assistant_spans(C.render_chat_template(df)).first()
        expect = [t["content"] for t in conv if t["role"] == "assistant"]
        got = [
            row["text"][s["span_start"] : s["span_end"]]
            for s in row["assistant_spans"]
        ]
        assert got == expect

    def test_spans_honor_bos(self, spark):
        df = C.parse_conversations(_conv_df(spark, [GOOD]))
        row = C.assistant_spans(
            C.render_chat_template(df, bos="<s>"), bos="<s>"
        ).first()
        (span,) = row["assistant_spans"]
        assert row["text"][span["span_start"] : span["span_end"]] == "hello!"


class TestExplode:
    def test_explode_round_trip(self, spark):
        df = C.parse_conversations(_conv_df(spark, [SYS, GOOD]))
        turns = C.explode_turns(df, "conv_id")
        assert turns.count() == 5
        back = (
            turns.groupBy("conv_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("turn_idx", "role", "content"))
                ).alias("ts")
            )
            .orderBy("conv_id")
            .collect()
        )
        assert [t["role"] for t in back[0]["ts"]] == ["system", "user", "assistant"]
        assert [t["content"] for t in back[1]["ts"]] == ["hi there", "hello!"]

    def test_no_python_udf_in_plan(self, spark):
        df = C.parse_conversations(_conv_df(spark, [GOOD]))
        plan = (
            C.assistant_spans(
                C.conversation_stats(C.render_chat_template(df))
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestSpansToTokenMask:
    def test_direct_spans(self, spark):
        df = spark.createDataFrame(
            [("aa bb cc dd", [(3, 8)]), ("aa bb", [])],
            "text string, assistant_spans array<struct<span_start:long,span_end:long>>",
        )
        got = [
            r["loss_mask"]
            for r in C.spans_to_token_mask(df).orderBy(F.length("text").desc()).collect()
        ]
        assert got == [[0, 1, 1, 0], [0, 0]]

    def test_half_open_boundaries_exclude_separators(self, spark):
        # span covering only the separator char touches neither token
        df = spark.createDataFrame(
            [("aa bb", [(2, 3)])],
            "text string, assistant_spans array<struct<span_start:long,span_end:long>>",
        )
        assert C.spans_to_token_mask(df).collect()[0]["loss_mask"] == [0, 0]

    def test_renderer_integration_masks_exactly_assistant_words(self, spark):
        # space-padded markers make the render whitespace-clean, so the
        # char spans project onto exactly the assistant content words
        turns = [
            ("user", "hello there"),
            ("assistant", "hi friend"),
            ("user", "more words"),
            ("assistant", "final answer here"),
        ]
        df = spark.createDataFrame(
            [(1, turns)],
            "doc_id long, turns array<struct<role:string,content:string>>",
        )
        kw = dict(open_l="<|", open_r="|> ", close=" <|end|> ", bos="")
        out = C.spans_to_token_mask(
            C.assistant_spans(C.render_chat_template(df, **kw), **{
                k: v for k, v in kw.items() if k != "close"
            } | {"close": kw["close"]})
        ).collect()[0]
        toks = out["text"].split()
        masked = [t for t, m in zip(toks, out["loss_mask"]) if m == 1]
        assert masked == ["hi", "friend", "final", "answer", "here"]

    def test_mask_is_expression_only(self, spark):
        df = spark.createDataFrame(
            [("x y", [(0, 1)])],
            "text string, assistant_spans array<struct<span_start:long,span_end:long>>",
        )
        plan = C.spans_to_token_mask(df)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
