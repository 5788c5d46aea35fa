"""Result-rendering sinks (SURVEY.md §2 B8; reference A7).

The reference renders query results to HTML via Handlebars templates
(reference src/template.rs:24-46, templates/page.hbs). Here the result
of any DataFrame is rendered driver-side after an explicit ``limit`` —
rendering is a presentation concern and must never pull an unbounded
result set to the driver.

Chart/PDF rendering (reference README.md:7) is gated behind optional
imports: matplotlib isn't guaranteed in the runtime image.
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame

_PAGE = """<!DOCTYPE html>
<html>
<head><title>{title}</title></head>
<body>
<h1>{title}</h1>
{body}
</body>
</html>
"""


def render_html(df: DataFrame, limit: int = 100, title: str = "result") -> str:
    """Render the first ``limit`` rows as an HTML table (layout mirrors
    the reference's page template: title header + content block)."""
    rows = df.limit(limit).collect()
    cols = df.columns
    head = "".join(f"<th>{_html.escape(c)}</th>" for c in cols)
    body_rows = "".join(
        "<tr>"
        + "".join(f"<td>{_html.escape(str(r[c]))}</td>" for c in cols)
        + "</tr>"
        for r in rows
    )
    table = f"<table><thead><tr>{head}</tr></thead><tbody>{body_rows}</tbody></table>"
    return _PAGE.format(title=_html.escape(title), body=table)


def render_error(message: str) -> str:
    """Error page (reference templates/error.hbs semantics)."""
    return _PAGE.format(title="error", body=f"<pre>{_html.escape(message)}</pre>")


def render_listing(name: str, items: list[str]) -> str:
    """Directory-listing page (reference templates/found_directory.hbs)."""
    lis = "".join(f"<li>{_html.escape(i)}</li>" for i in items)
    return _PAGE.format(title=_html.escape(name), body=f"<ul>{lis}</ul>")


def render_chart_png(df: DataFrame, x: str, y: str, limit: int = 1000) -> bytes:
    """Bar chart of x vs y → PNG bytes. Optional dependency; raises a
    clear error when matplotlib is absent (not in the v1 image)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import io

        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - env without matplotlib
        raise NotImplementedError(
            "chart rendering requires matplotlib, which is not installed"
        ) from e
    pdf = df.select(x, y).limit(limit).toPandas()
    fig, ax = plt.subplots()
    ax.bar(pdf[x].astype(str), pdf[y])
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    return buf.getvalue()
