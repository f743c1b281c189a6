#version 330 core
// f64-precision point program ("relative-to-eye" split doubles): each
// world coordinate is stored as hi + lo f32 pairs; the camera origin is
// split the same way and subtracted term-by-term, so the difference is
// computed to ~f64 precision while every GPU register stays f32.  This is
// the portable counterpart of the reference's f64 (dvec3) program pair
// (sdl_viewer/src/node_drawer.rs:56-108).
uniform mat4 rel_to_clip;
uniform vec3 origin_hi;
uniform vec3 origin_lo;
uniform float point_size;
in vec3 position_hi;
in vec3 position_lo;
in vec3 color;
out vec3 v_color;
void main() {
  vec3 t1 = position_hi - origin_hi;
  vec3 t2 = position_lo - origin_lo;
  vec3 rel = t1 + t2;
  gl_Position = rel_to_clip * vec4(rel, 1.0);
  gl_PointSize = point_size;
  v_color = color;
}
