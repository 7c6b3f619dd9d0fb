"""Native (C) components, built on demand with graceful numpy fallbacks."""
