"""Scalar / vectorized functions: tokenizer, line classifier, text analysis."""
