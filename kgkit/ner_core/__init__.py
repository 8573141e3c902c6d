"""Pure-Python NER span algebra with reference parity.

Every function here reproduces the observable behavior of the
corresponding operator in flxst/nerblackbox (citations in docstrings).
The module has no Spark or torch dependency: the same code runs inside
Arrow-vectorized UDFs on executors and in plain pytest on the driver,
so parity is tested without a cluster and Spark adds only distribution.
"""

from kgkit.ner_core.schemes import (
    convert_scheme,
    fix_bio_tag,
    fix_bilou_tag,
    fix_scheme,
    iob1_to_iob2,
    plain_to_bio,
    plain_to_bilou,
    to_plain,
    bilou_to_bio,
)
from kgkit.ner_core.spans import (
    merge_slices,
    merge_subtokens,
    restore_unknown_tokens,
    merge_tokens_to_words,
    unpretokenize,
    autocorrect_scheme,
    merge_tokens_to_entities,
    strip_sentencepiece_marker,
    resolve_overlapping_tags,
)
from kgkit.ner_core.pretokenize import pretokenize
from kgkit.ner_core.text_codec import TextCodec
from kgkit.ner_core.wordpiece import (
    SentencePieceTokenizer,
    WordPieceTokenizer,
    default_sp_tokenizer,
    default_tokenizer,
    group_subtokens,
)
from kgkit.ner_core.tagger import GazetteerTagger, default_gazetteer
from kgkit.ner_core.pipeline import predict

__all__ = [
    "convert_scheme",
    "fix_bio_tag",
    "fix_bilou_tag",
    "fix_scheme",
    "iob1_to_iob2",
    "plain_to_bio",
    "plain_to_bilou",
    "to_plain",
    "bilou_to_bio",
    "merge_slices",
    "merge_subtokens",
    "restore_unknown_tokens",
    "merge_tokens_to_words",
    "unpretokenize",
    "autocorrect_scheme",
    "merge_tokens_to_entities",
    "strip_sentencepiece_marker",
    "resolve_overlapping_tags",
    "pretokenize",
    "TextCodec",
    "WordPieceTokenizer",
    "default_tokenizer",
    "SentencePieceTokenizer",
    "default_sp_tokenizer",
    "group_subtokens",
    "GazetteerTagger",
    "default_gazetteer",
    "predict",
]
