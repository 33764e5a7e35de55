"""Model-architecture visualization.

Parity with utils/draw_net.py (get_pydot_graph :61, draw_to_file :130): emit
a graph of the model's layer DAG.  Here the DAG comes from an
:class:`~ip_avsr_tpu.models.adenet.AdeNetConfig` (the composer's declarative
form) rather than introspecting a framework graph.  Output is Graphviz dot
text; rendering to PNG uses pydot when available.
"""

from __future__ import annotations


def _esc(s: str) -> str:
    return s.replace('"', r"\"")


def config_to_dot(config, name: str = "adenet") -> str:
    """AdeNetConfig -> graphviz dot source describing the layer DAG."""
    lines = [f'digraph "{_esc(name)}" {{', "  rankdir=TB;",
             '  node [shape=record, fontsize=10];']
    fuse_inputs = []
    for spec in config.streams:
        sid = spec.name
        prev = f"in_{sid}"
        lines.append(f'  {prev} [label="input {sid}|dim {spec.input_dim}"];')
        if spec.encoder_shapes:
            node = f"enc_{sid}"
            shape_str = "-".join(str(s) for s in spec.encoder_shapes)
            lines.append(f'  {node} [label="encoder {sid}|{shape_str}"];')
            lines.append(f"  {prev} -> {node};")
            prev = node
        if spec.use_batchnorm:
            node = f"bn_{sid}"
            lines.append(f'  {node} [label="batchnorm {sid}"];')
            lines.append(f"  {prev} -> {node};")
            prev = node
        if spec.use_delta:
            node = f"delta_{sid}"
            lines.append(f'  {node} [label="delta {sid}|win {config.window}|x3"];')
            lines.append(f"  {prev} -> {node};")
            prev = node
        if spec.dropout:
            node = f"drop_{sid}"
            lines.append(f'  {node} [label="dropout {sid}|p {spec.dropout}"];')
            lines.append(f"  {prev} -> {node};")
            prev = node
        if spec.use_lstm:
            node = f"lstm_{sid}"
            lines.append(f'  {node} [label="lstm {sid}|{config.stream_lstm_size(spec)}"];')
            lines.append(f"  {prev} -> {node};")
            prev = node
        fuse_inputs.append(prev)

    lines.append(f'  fuse [label="fusion|{config.fusiontype}"];')
    for node in fuse_inputs:
        lines.append(f"  {node} -> fuse;")
    prev = "fuse"
    for i, size in enumerate(config.aggregator_sizes()):
        kind = "blstm" if config.agg_bidirectional else "lstm"
        node = f"agg{i}"
        lines.append(f'  {node} [label="{kind} agg {i + 1}|{size}"];')
        lines.append(f"  {prev} -> {node};")
        prev = node
    head = ("softmax per-step" if config.output_mode == "per_step"
            else "slice(-1) + softmax")
    lines.append(f'  out [label="{head}|{config.output_classes} classes"];')
    lines.append(f"  {prev} -> out;")
    lines.append("}")
    return "\n".join(lines)


def draw_to_file(config, filename: str, name: str = "adenet"):
    """Write the DAG: .dot always works; .png/.pdf need pydot+graphviz."""
    dot_src = config_to_dot(config, name)
    if filename.endswith(".dot"):
        with open(filename, "w") as f:
            f.write(dot_src)
        return filename
    try:
        import pydot

        graph = pydot.graph_from_dot_data(dot_src)[0]
        ext = filename.rsplit(".", 1)[-1]
        graph.write(filename, format=ext)
        return filename
    except Exception:
        fallback = filename.rsplit(".", 1)[0] + ".dot"
        with open(fallback, "w") as f:
            f.write(dot_src)
        return fallback
