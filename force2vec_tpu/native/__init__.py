"""Native (C++) components: graph IO. Built on demand via graphs/native.py."""
