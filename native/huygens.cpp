// Huygens-Fresnel direct summation: native OpenMP kernel.
//
// The coherent field at each image point is the sum of spherical wavelets
// from every pupil sample with an obliquity factor
// (reference: optiland/psf/huygens_fresnel_strategies.py:97-172, a numba
// parallel loop; this is the C++/OpenMP equivalent used by the CPU path).
//
// Complex amplitude accepted as separate re/im arrays so the ABI stays
// plain-C for ctypes.

#include <cmath>
#include <cstdint>

extern "C" {

void huygens_sum(
    const double* image_x, const double* image_y, const double* image_z,
    int64_t n_img,
    const double* pupil_x, const double* pupil_y, const double* pupil_z,
    const double* amp_re, const double* amp_im, const double* opd_mm,
    int64_t n_pupil,
    double wavelength_mm, double Rp,
    double* out_re, double* out_im)
{
    const double k = 2.0 * M_PI / wavelength_mm;
    const double inv_Rp = 1.0 / Rp;

#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_img; ++i) {
        const double xi = image_x[i];
        const double yi = image_y[i];
        const double zi = image_z[i];
        double acc_re = 0.0, acc_im = 0.0;
        for (int64_t j = 0; j < n_pupil; ++j) {
            const double dx = xi - pupil_x[j];
            const double dy = yi - pupil_y[j];
            const double dz = zi - pupil_z[j];
            const double R = std::sqrt(dx * dx + dy * dy + dz * dz);
            const double inv_R = 1.0 / R;
            // obliquity: cos angle between (image - pupil) and the pupil
            // normal (pupil point / Rp), Kirchhoff inclination (1+cos)/2
            const double dot = (dx * pupil_x[j] + dy * pupil_y[j]
                                + dz * pupil_z[j]) * inv_Rp;
            const double q = 0.5 * (1.0 + dot * inv_R);
            // wavelet phase: k * (R - opd); amplitude amp / R
            const double phase = k * (R - opd_mm[j]);
            const double c = std::cos(phase);
            const double s = std::sin(phase);
            const double w = q * inv_R;
            // (amp_re + i amp_im) * (c + i s) * w
            acc_re += w * (amp_re[j] * c - amp_im[j] * s);
            acc_im += w * (amp_re[j] * s + amp_im[j] * c);
        }
        out_re[i] = acc_re;
        out_im[i] = acc_im;
    }
}

// |field|^2 convenience: PSF without materializing the complex field.
void huygens_psf(
    const double* image_x, const double* image_y, const double* image_z,
    int64_t n_img,
    const double* pupil_x, const double* pupil_y, const double* pupil_z,
    const double* amp_re, const double* amp_im, const double* opd_mm,
    int64_t n_pupil,
    double wavelength_mm, double Rp,
    double* out_psf)
{
    const double k = 2.0 * M_PI / wavelength_mm;
    const double inv_Rp = 1.0 / Rp;

#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_img; ++i) {
        const double xi = image_x[i];
        const double yi = image_y[i];
        const double zi = image_z[i];
        double acc_re = 0.0, acc_im = 0.0;
        for (int64_t j = 0; j < n_pupil; ++j) {
            const double dx = xi - pupil_x[j];
            const double dy = yi - pupil_y[j];
            const double dz = zi - pupil_z[j];
            const double R = std::sqrt(dx * dx + dy * dy + dz * dz);
            const double inv_R = 1.0 / R;
            const double dot = (dx * pupil_x[j] + dy * pupil_y[j]
                                + dz * pupil_z[j]) * inv_Rp;
            const double q = 0.5 * (1.0 + dot * inv_R);
            const double phase = k * (R - opd_mm[j]);
            const double c = std::cos(phase);
            const double s = std::sin(phase);
            const double w = q * inv_R;
            acc_re += w * (amp_re[j] * c - amp_im[j] * s);
            acc_im += w * (amp_re[j] * s + amp_im[j] * c);
        }
        out_psf[i] = acc_re * acc_re + acc_im * acc_im;
    }
}

}  // extern "C"
