#version 330 core
// f32 point program: positions arrive NODE-NORMALIZED in [0, 1] exactly as
// stored on disk (u8/u16 normalized attributes or f32), and the shader
// performs the decode min + t * edge — the reference's normalized-decode
// pipeline (sdl_viewer/shaders/points.vs, node_drawer.rs:56-108).
// cube_min is CAMERA-RELATIVE (f64 subtraction happens on the host) so f32
// precision survives planet-scale clouds.
uniform mat4 rel_to_clip;
uniform vec3 cube_min;
uniform float edge_length;
uniform float point_size;
in vec3 position;
in vec3 color;
out vec3 v_color;
void main() {
  vec3 rel = cube_min + position * edge_length;
  gl_Position = rel_to_clip * vec4(rel, 1.0);
  gl_PointSize = point_size;
  v_color = color;
}
