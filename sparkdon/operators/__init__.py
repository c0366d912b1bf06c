"""Scale-oriented operator helpers (skew handling, dictionary encoding)."""
