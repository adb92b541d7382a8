"""PCM container writers: WAV, AIFF, AIFC, FLAC, raw stdout."""
