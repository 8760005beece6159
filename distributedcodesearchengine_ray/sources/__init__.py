from .corpus import gen_corpus_table, write_corpus, read_corpus

__all__ = ["gen_corpus_table", "write_corpus", "read_corpus"]
