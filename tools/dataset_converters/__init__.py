"""CLI tools (installable as stereotracking_tpu.tools.*)."""
