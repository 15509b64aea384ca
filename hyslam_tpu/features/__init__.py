"""Feature system: extraction pipeline, matching engine, vocabulary/BoW —
the TPU-native src/features (SURVEY.md §2.5)."""
