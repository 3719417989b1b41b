"""Augmentation layer tests: POS tagger, synonyms, backtranslation backends,
crop synthesis, LLM parsing, positive mining, MLM augmentation, dataset
creation drivers."""

import json
import os

import numpy as np
import pytest

import jax

from qst_tpu.augment import (
    ADAPTIVE_CROP,
    SynonymAugmenter,
    IdentityBacktranslator,
    ParaphraseBacktranslator,
    adaptive_crop_part_pos_examples,
    build_llm_prompt,
    compute_cosine_scores,
    crop_text_based_on_tagging,
    get_part_pos_examples,
    mock_llm_response,
    parse_llm_response,
    pop_random_caption,
    pos_tag_universal,
    select_positive_examples,
)
from qst_tpu.core.config import (
    KEY_PART_POSITIVE,
    KEY_POSITIVE,
    KEY_REFERENCE,
)
from qst_tpu.data.chunks import ChunkStore
from qst_tpu.data.coco import CocoCaptionsSource, create_coco_dataset
from qst_tpu.data.sentence_compression import (
    create_dataset_sentence_compression,
    generate_variations,
    get_part_pos_examples_sentence_compr,
    get_pos_examples_sentence_compr,
)

from helpers import hash_embed


# ------------------------------------------------------------- POS tagging
def test_pos_tagger_caption():
    tags = dict(pos_tag_universal("a red car drives down the road"))
    assert tags["a"] == "DET"
    assert tags["the"] == "DET"
    assert tags["car"] == "NOUN"
    assert tags["road"] == "NOUN"
    assert tags["down"] == "ADP"
    assert tags["red"] in ("ADJ", "NOUN")  # either is fine for cropping


def test_pos_tagger_punct_and_verbs():
    tags = pos_tag_universal("A dog runs, jumps and swims.")
    by_word = {w.lower(): t for w, t in tags}
    assert by_word["runs"] == "VERB"
    assert by_word[","] == "."
    assert by_word["."] == "."
    assert by_word["and"] == "CONJ"


# ---------------------------------------------------------------- synonyms
def test_synonym_augmenter_replaces_and_respects_stopwords():
    aug = SynonymAugmenter(aug_min=1, aug_max=2, seed=3, use_wordnet=False)
    text = "the big dog"
    out = aug.augment_one(text)
    assert out != text  # big and/or dog have lexicon entries
    assert out.split()[0] == "the"  # stopword untouched
    # no candidates → unchanged
    assert aug.augment_one("qwerty zxcvb") == "qwerty zxcvb"
    # list API
    outs = aug.augment(["the big dog", "a small cat"])
    assert len(outs) == 2
    with pytest.raises(ValueError):
        SynonymAugmenter(aug_min=3, aug_max=1)


# ---------------------------------------------------------- backtranslation
def test_backtranslation_backends():
    ident = IdentityBacktranslator()
    assert ident.backtranslate(["hello world"]) == ["hello world"]
    para = ParaphraseBacktranslator(seed=5)
    outs = para.backtranslate(["the big dog runs fast", "a small cat"])
    assert len(outs) == 2
    assert all(isinstance(o, str) and o for o in outs)


def test_format_batch_texts():
    from qst_tpu.augment import format_batch_texts

    assert format_batch_texts(["hi"], "fr") == [">>fr<< hi"]


# ------------------------------------------------------------------- crops
def test_crop_suffix_keeps_prefix():
    text = "a man riding a brown horse next to a red barn on a sunny day"
    rng = np.random.default_rng(1)
    crops = crop_text_based_on_tagging(text, crop_prefix=False, repeat=5,
                                       rng=rng)
    for crop in crops:
        assert crop  # non-empty
        assert text.startswith(crop.split(" ")[0])  # starts at text start
        assert len(crop.split()) < len(text.split())  # actually cropped


def test_crop_prefix_keeps_suffix():
    text = "a man riding a brown horse next to a red barn on a sunny day"
    rng = np.random.default_rng(2)
    crops = crop_text_based_on_tagging(text, crop_prefix=True, repeat=5,
                                       rng=rng)
    for crop in crops:
        assert crop
        assert crop.split(" ")[-1] == "day"  # ends at text end
        assert len(crop.split()) < len(text.split())
        # kept side starts at a NOUN/VERB/DET boundary
        first_tag = pos_tag_universal(crop)[0][1]
        assert first_tag in ("NOUN", "VERB", "DET")


def test_adaptive_crop_count_and_partiality():
    text = "a man riding a brown horse next to a red barn on a sunny day"
    ex = adaptive_crop_part_pos_examples(text, 6, rng=np.random.default_rng(3))
    assert len(ex) == 6
    assert all(e for e in ex)


# ---------------------------------------------------------------- LLM path
def test_parse_llm_response():
    parsed = parse_llm_response(mock_llm_response("x"))
    assert len(parsed) == 5
    assert parsed[0] == "woman wearing a hat"
    assert all(";" not in p and not p.endswith(".") for p in parsed)
    with pytest.raises(ValueError):
        parse_llm_response("1. only one item")


def test_get_part_pos_examples_strategies():
    text = "a woman standing in a parking lot taking a photo"
    ex = get_part_pos_examples(text, 4, algorithm_type=ADAPTIVE_CROP,
                               rng=np.random.default_rng(0))
    assert len(ex) == 4
    llm = get_part_pos_examples(text, 5, algorithm_type="llm")
    assert len(llm) == 5  # mock response parsed
    prompt = build_llm_prompt(text)
    assert text in prompt


# --------------------------------------------------------- positive mining
def test_pop_random_caption():
    rng = np.random.default_rng(0)
    caps = ["a", "b", "c", "d"]
    got = pop_random_caption(caps, rng=rng)
    assert got in "abcd" and len(caps) == 3 and got not in caps
    # forbidden forces the other choice
    caps2 = ["x", "y"]
    got2 = pop_random_caption(caps2, forbidden={"x"}, rng=rng)
    assert got2 == "y"
    # exhausted forbidden → duplicate returned, list unchanged
    caps3 = ["only"]
    got3 = pop_random_caption(caps3, forbidden={"only"}, max_iterations=3,
                              rng=rng)
    assert got3 == "only" and caps3 == ["only"]
    with pytest.raises(ValueError):
        pop_random_caption(["a"], max_iterations=0)


def test_compute_cosine_scores():
    scores = compute_cosine_scores(
        "a cat sits on the mat",
        ["the cat rests on a mat", "a dog runs in the park"],
        lambda xs: hash_embed(list(xs)))
    assert scores.shape == (2,)
    assert scores[0] > 0.9 > scores[1]


def test_select_positive_examples_threshold_path():
    group = [
        "a cat sits on the mat",
        "the cat rests on a mat",
        "a small cat lying on the rug",
        "a young cat on the carpet",
    ]
    rng = np.random.default_rng(4)
    pos, ref, scores = select_positive_examples(
        list(group), lambda xs: hash_embed(list(xs)), threshold=0.6,
        n_examples=3, augment=False, return_similarities=True,
        max_attempts=2, rng=rng)
    assert ref in group
    assert len(pos) == 3
    assert all(p != ref for p in pos[: min(3, 3)])


def test_select_positive_examples_topk_backup():
    # nothing passes threshold → top-2 backup + replicate/augment fill
    group = ["a cat sits on the mat", "a dog runs in the park",
             "a plate of pasta with sauce", "an airplane flies high"]
    rng = np.random.default_rng(5)
    pos = select_positive_examples(
        list(group), lambda xs: hash_embed(list(xs)), threshold=0.99,
        n_examples=4, augment=True, max_attempts=2, rng=rng)
    assert len(pos) == 4
    with pytest.raises(ValueError):
        select_positive_examples(list(group), lambda xs: hash_embed(list(xs)),
                                 max_attempts=0)


# --------------------------------------------------------------------- MLM
def test_mlm_augmenter_substitute_and_insert():
    from qst_tpu.augment import MLMAugmenter
    from qst_tpu.core.config import EncoderConfig
    from qst_tpu.models.mlm import init_mlm_params
    from qst_tpu.models.tokenizer import WordPieceTokenizer

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "the", "cat",
             "dog", "sat", "ran", "on", "mat", "park", "in", "big", "small"]
    tok = WordPieceTokenizer({w: i for i, w in enumerate(words)})
    cfg = EncoderConfig.tiny(vocab_size=len(words))
    params = init_mlm_params(cfg, jax.random.key(0))

    sub = MLMAugmenter(cfg, params, tok, action="substitute", aug_min=1,
                       aug_max=1, top_k=3, seed=1)
    out = sub.augment(["the cat sat on the mat"])
    assert len(out) == 1
    assert len(out[0].split()) == 6  # same word count
    ins = MLMAugmenter(cfg, params, tok, action="insert", aug_min=1,
                       aug_max=1, top_k=3, seed=2)
    out2 = ins.augment(["the cat sat"])
    assert len(out2[0].split()) == 4  # one inserted word
    with pytest.raises(ValueError):
        MLMAugmenter(cfg, params, tok, action="delete")


# ------------------------------------------------------- dataset creation
def _write_coco_ann(path, n_images=6):
    anns, images = [], []
    groups = [
        ["a cat sits on the mat", "the cat rests on a mat",
         "a small cat lying on the rug", "a young cat on the carpet",
         "a cat on a mat indoors"],
        ["a dog runs in the park", "the dog sprints across the grass",
         "a young dog playing in the field", "a dog chasing a ball outside",
         "a dog running outdoors"],
    ]
    aid = 0
    for i in range(n_images):
        images.append({"id": 100 + i})
        for cap in groups[i % 2]:
            anns.append({"id": aid, "image_id": 100 + i, "caption": cap})
            aid += 1
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": anns}, f)


def test_coco_source_and_creation(tmp_path):
    ann = str(tmp_path / "captions.json")
    _write_coco_ann(ann, n_images=6)
    src = CocoCaptionsSource(ann, dataset_name="mini_coco")
    assert len(src) == 6
    assert len(src[0]) == 5

    last = create_coco_dataset(
        str(tmp_path / "out"), src, lambda xs: hash_embed(list(xs)),
        chunk_dim=4, n_pos_examples=3, n_part_pos_examples=4,
        part_pos_algorithm=ADAPTIVE_CROP)
    assert last == 1  # 6 images / chunk_dim 4 → chunks 0 and 1
    store = ChunkStore(str(tmp_path / "out" / "mini_coco"))
    assert len(store) == 6
    inst = store.get_instance(0)
    # >= n: everything above threshold is kept (reference semantics — fill
    # only when lacking, never truncate)
    assert len(inst[KEY_POSITIVE]) >= 3
    assert len(inst[KEY_PART_POSITIVE]) == 4
    assert inst[KEY_REFERENCE]


def test_coco_creation_resume(tmp_path):
    ann = str(tmp_path / "captions.json")
    _write_coco_ann(ann, n_images=6)
    src = CocoCaptionsSource(ann)
    # first build only chunk 0, then resume from chunk 1
    last = create_coco_dataset(str(tmp_path / "out"), src,
                               lambda xs: hash_embed(list(xs)),
                               chunk_dim=4, last_chunk=0,
                               part_pos_algorithm=ADAPTIVE_CROP)
    assert last == 0
    last2 = create_coco_dataset(str(tmp_path / "out"), src,
                                lambda xs: hash_embed(list(xs)),
                                chunk_dim=4, start_chunk=1,
                                part_pos_algorithm=ADAPTIVE_CROP)
    assert last2 == 1


def test_sentence_compression_classification(tmp_path):
    rec_pos = {"sentence": "the quick brown fox jumps over the lazy dog near the barn",
               "compression": "the fox jumps over the dog near the barn",
               "compression_ratio": 0.8}
    rec_part = {"sentence": "the quick brown fox jumps over the lazy dog near the barn",
                "compression": "fox jumps",
                "compression_ratio": 0.2}
    pos, ref = get_pos_examples_sentence_compr(rec_pos, n=4, seed=0)
    assert rec_pos["compression"] in pos  # high ratio → positive
    assert ref == rec_pos["sentence"]
    assert len(pos) >= 4

    part = get_part_pos_examples_sentence_compr(rec_part, n=4, seed=0)
    assert rec_part["compression"] in part  # low ratio → part positive
    part2 = get_part_pos_examples_sentence_compr(rec_pos, n=4, seed=0)
    assert rec_pos["compression"] not in part2

    records = [rec_pos, rec_part] * 3
    last = create_dataset_sentence_compression(
        str(tmp_path / "sc"), records, chunk_dim=4)
    assert last == 1
    store = ChunkStore(str(tmp_path / "sc" / "sent_compr"))
    assert len(store) == 6


def test_generate_variations():
    outs = generate_variations("the big dog runs in the park", n=3, seed=1)
    assert len(outs) == 3
    assert generate_variations("x", n=0) == []
