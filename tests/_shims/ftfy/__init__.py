def fix_text(x, *a, **k):
    return x
