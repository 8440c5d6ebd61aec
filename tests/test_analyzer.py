"""Analyzer golden tests (FIXTURES.md: test_analyzer_golden) — pin the
token stream before anything depends on it (SURVEY.md §7.4: the tokenizer's
sub-token dedup makes streams order-sensitive)."""

import json
from pathlib import Path

from rayse.analyzer import STOPWORDS, analyze, porter_stem, tokenize

GOLDEN = json.loads((Path(__file__).parent / "golden_tokens.json").read_text())


def test_analyzer_golden():
    for row in GOLDEN:
        assert analyze(row["text"]) == row["tokens"], (
            row["conv_id"], row["turn_idx"])


def test_tokenizer_compound_paths():
    # PreIndexer.java:126-159 sub-token expansion with first-occurrence dedup
    assert tokenize("numpy.array x+=1 /usr/bin .py") == [
        "numpy.array", "numpy", "array", "x", "1",
        "/usr/bin", "usr", "bin", ".py", "py"]
    # dedup against the WHOLE emitted stream (`words.contains(part)`)
    assert tokenize("array numpy.array") == ["array", "numpy.array", "numpy"]


def test_stopword_and_length_filter():
    # PreIndexer.java:41-46: stopwords and length<=1 dropped pre-stem
    assert analyze("the a an x running") == ["run"]
    assert "the" in STOPWORDS and "of" in STOPWORDS


def test_porter_classic_vectors():
    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "valenci": "valenc",
        "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
        "radicalli": "radic", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "formalize": "formal", "electriciti": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
        "defensible": "defens", "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
        "homologou": "homolog", "communism": "commun", "activate": "activ",
        "angulariti": "angular", "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
    }
    for w, want in vectors.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_analyze_per_turn_text_equality():
    """Per-turn invariant: analysis is a pure function of the turn text —
    equal texts yield equal token streams regardless of surrounding rows."""
    for row in GOLDEN:
        assert analyze(str(row["text"])) == analyze(row["text"])
