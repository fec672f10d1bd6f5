"""Sources: synthetic interleaved-span corpus, minimal PDF builder, PDF lexer."""
